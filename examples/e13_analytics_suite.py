"""Product-analytics suite over the events table: funnels, cohorts,
range classification, nearest-match as-of, weighted sampling.

No single reference example covers these (they extend the engine the
way a training-data/product pipeline needs); each operator shown here
is oracle-checked in `__spark_entry__.py` (funnel_steps,
retention_cohorts, range_join_bands, asof_nearest, weighted_sample,
containment_pairs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from common import get_example_spark, show

SF_DIR = "/root/testdata/sf0.001"


def main(spark):
    from async_stream_processing_spark.llm.dedup import (
        containment_pairs,
        doc_shingle_hashes,
    )
    from async_stream_processing_spark.llm.sampling import weighted_sample
    from async_stream_processing_spark.operators.analytics import (
        funnel_steps,
        retention_cohorts,
    )
    from async_stream_processing_spark.operators.asof import asof_join_nearest
    from async_stream_processing_spark.operators.range_join import range_join
    from async_stream_processing_spark.sources.parquet import load_table
    from async_stream_processing_spark.plans.event_relation import (
        events_relation,
    )

    ev = events_relation(spark, SF_DIR)
    docs = load_table(spark, SF_DIR, "documents")

    funnel = funnel_steps(ev, "user_id", ["signup", "click", "purchase"])
    show(
        funnel.groupBy("converted").agg(F.count(F.lit(1)).alias("n_users")),
        label="signup -> click -> purchase conversion",
    )

    show(
        retention_cohorts(ev, "user_id", "week").orderBy(
            "cohort_day", "offset"
        ),
        n=8,
        label="weekly cohort retention cells",
    )

    bands = spark.createDataFrame(
        [(0, 0.0, 50.0), (1, 40.0, 120.0), (2, 100.0, 500.0)],
        "tier int, lo double, hi double",
    )
    tiers = range_join(ev, bands, "value", bucket_width=50.0)
    show(
        tiers.groupBy("tier").agg(F.count(F.lit(1)).alias("n_events")),
        label="value tiers via bucketized range join (overlapping bands)",
    )

    trades = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "seq", "user_id", F.col("value").alias("price")
    )
    quotes = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "seq", F.col("value").alias("mid")
    )
    nearest = asof_join_nearest(
        trades, quotes, on=["user_id"], right_cols=["mid"],
        tolerance_seconds=600,
    )
    show(
        nearest.select("event_id", "ts", "matched_ts", "price", "mid"),
        n=5,
        label="purchases marked at the NEAREST view within +/-10 min",
    )

    show(
        weighted_sample(docs, k=5).select("doc_id", "weight", "rank"),
        n=5,
        label="sequential-Poisson sample (inclusion ~ token count)",
    )

    contained = containment_pairs(doc_shingle_hashes(docs), 0.4)
    show(
        contained.select("doc_a", "doc_b", "containment"),
        n=5,
        label="doc-inside-doc pairs (containment >= 0.4)",
    )
    return funnel


if __name__ == "__main__":
    main(get_example_spark())
