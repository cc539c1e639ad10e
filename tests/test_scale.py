"""Scale utilities: result-equality of physical-plan rewrites."""

from __future__ import annotations

from pyspark.sql import functions as F

from async_stream_processing_spark.plans.scale import salted_join


def test_salted_join_equals_plain_join(spark):
    # one pathologically hot key (90% of rows) + a long tail
    big = spark.createDataFrame(
        [(0 if i % 10 else i % 7, i) for i in range(5000)], "k int, v long"
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(7)], "k int, name string")
    plain = set(map(tuple, big.join(small, "k").select("k", "v", "name").collect()))
    salted = set(map(tuple, salted_join(big, small, "k", salt=8)
                     .select("k", "v", "name").collect()))
    assert salted == plain
    assert len(salted) == 5000


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, 10), (99, 20)], "k int, v long")
    small = spark.createDataFrame([(1, "a")], "k int, name string")
    out = {tuple(r) for r in salted_join(big, small, "k", salt=4, how="left")
           .select("k", "v", "name").collect()}
    assert out == {(1, 10, "a"), (99, 20, None)}


def test_stratified_sample_deterministic(spark):
    from async_stream_processing_spark.llm.sampling import stratified_sample
    from async_stream_processing_spark.sources.parquet import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    a = sorted(r["doc_id"] for r in stratified_sample(docs).collect())
    b = sorted(r["doc_id"] for r in stratified_sample(docs.repartition(13)).collect())
    assert a == b  # partitioning-independent (hash-gated, not rand())
    assert 0 < len(a) < docs.count()
