"""Embedding analytics + graph centrality: exact distributed covariance,
PCA projection, and integer PageRank over the user-handoff graph.

Each operator shown here is oracle- or property-checked elsewhere
(`embedding_covariance`, `pca_project`, `pagerank_users` in
`__spark_entry__.py`; invariants in tests/test_linalg.py) -- this example
is the end-to-end narrative: reduce 64-dim embeddings to 4 principal
components, then rank users by influence in the event stream.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from common import get_example_spark, show

SF_DIR = "/root/testdata/sf0.001"


def main(spark):
    from pyspark.sql import Window

    from async_stream_processing_spark.llm.linalg import (
        gram_exact,
        pca_components,
        pca_project,
    )
    from async_stream_processing_spark.operators.graph import pagerank
    from async_stream_processing_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    ev = load_table(spark, SF_DIR, "events")

    # 1. exact covariance (integer-quantized): top off-diagonal pairs
    cov = gram_exact(emb)
    show(
        cov.filter(F.col("i") != F.col("j"))
        .orderBy(F.abs(F.col("cov_scaled").cast("double")).desc())
        .select("i", "j", "cov_scaled"),
        n=5,
        label="most-correlated embedding dimension pairs (exact, scaled)",
    )

    # 2. PCA: variance explained + 4-dim projection
    model = pca_components(emb, k=4)
    comps, var, _ = model
    print("explained variance (top-4):", [round(v, 6) for v in var])
    proj = pca_project(emb, k=4, model=model)
    show(proj, n=5, label="64-dim embeddings projected to 4 PCs")

    # 3. PageRank over the session-handoff graph
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    edges = (
        ev.select(
            F.col("user_id").alias("src"),
            F.lead("user_id").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    ranks = pagerank(edges, n_iter=3)
    show(
        ranks.orderBy(F.desc("rank_scaled")),
        n=5,
        label="most-central users (integer PageRank, 3 iterations)",
    )
    return ranks


if __name__ == "__main__":
    s = get_example_spark("e14_embedding_graph")
    try:
        main(s)
    finally:
        s.stop()
