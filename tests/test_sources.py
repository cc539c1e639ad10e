"""File-format sources and decontamination semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from async_stream_processing_spark.llm.decontaminate import decontaminate, redact
from async_stream_processing_spark.sources.files import read_csv, read_json


def test_csv_json_round_trip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    df.write.mode("overwrite").option("header", True).csv(str(tmp_path / "c"))
    df.write.mode("overwrite").json(str(tmp_path / "j"))
    back_c = read_csv(spark, str(tmp_path / "c"), "id long, name string")
    back_j = read_json(spark, str(tmp_path / "j"), "id long, name string")
    assert sorted(map(tuple, back_c.collect())) == [(1, "a"), (2, "b")]
    assert sorted(map(tuple, back_j.collect())) == [(1, "a"), (2, "b")]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_decontaminate_flags_ngram_overlap(spark):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = _docs(spark, [
        "prefix words " + bench_text + " suffix words",   # contains bench 8-grams
        "totally disjoint content nothing shared here at all whatsoever now",
    ])
    bench = _docs(spark, [bench_text]).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    out = decontaminate(corpus, bench, n=8).collect()
    assert [(r["doc_id"], r["bench_id"]) for r in out] == [(0, 0)]
    assert out[0]["n_collisions"] == 3  # 10 words -> 3 distinct 8-grams


def test_redact_scrubs_and_counts(spark):
    docs = _docs(spark, ["mail me at bob.smith@corp.com or call 555 1234"])
    r = redact(docs).collect()[0]
    assert r["clean_text"] == "mail me at <EMAIL> or call <NUM> <NUM>"
    assert (r["n_emails_redacted"], r["n_numbers_redacted"]) == (1, 2)


def test_register_catalog_sql_access(spark):
    from async_stream_processing_spark.session import register_catalog

    register_catalog(spark, "/root/testdata/sf0.001")
    out = spark.sql("""
        SELECT e.event_type, COUNT(DISTINCT e.user_id) AS n_users
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY e.event_type ORDER BY e.event_type
    """).collect()
    assert len(out) >= 3
    assert all(r["n_users"] > 0 for r in out)
    # timestamps repaired on the SQL path too (nanos parquet -> usable ts)
    one = spark.sql("SELECT MIN(ts) AS t FROM events").first()
    assert one["t"].year >= 2020 or one["t"].year >= 1995
