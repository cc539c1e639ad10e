"""Training-data curation on the driver's documents/embeddings tables.

The reference has no analog for this example -- it demonstrates the
north-star LLM-pipeline operators (BASELINE.json) that extend the
engine beyond the reference's query surface: text quality stats,
exact + MinHash-LSH near dedup, cosine top-k similarity search, and the
whole curation chain composed into ONE declarative plan
(`llm/pipeline.training_pipeline`).  Every operator shown here is also
oracle-checked in `__spark_entry__.py` (dedup_exact, dedup_minhash_lsh,
knn_bruteforce, pipeline_end_to_end).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from common import get_example_spark, show

SF_DIR = "/root/testdata/sf0.001"


def main(spark):
    from async_stream_processing_spark.llm.dedup import (
        exact_dedup,
        minhash_dedup_pairs,
    )
    from async_stream_processing_spark.llm.pipeline import training_pipeline
    from async_stream_processing_spark.llm.similarity import knn_bruteforce
    from async_stream_processing_spark.llm.text_analysis import quality_score
    from async_stream_processing_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")

    show(
        quality_score(docs).select(
            "doc_id", "n_words", "stopword_ratio", "punct_ratio", "quality_score"
        ),
        n=5, label="text quality gate",
    )

    show(exact_dedup(docs).filter(F.col("n_copies") > 1),
         n=5, label="exact duplicate groups")

    pairs = minhash_dedup_pairs(docs, threshold=0.5)
    show(pairs.select("doc_a", "doc_b", "jaccard"), n=5,
         label="MinHash-LSH near-dup pairs (verified Jaccard >= 0.5)")

    show(knn_bruteforce(emb, n_queries=3, k=3), n=9,
         label="cosine top-3 neighbors for 3 query vectors")

    mix = training_pipeline(docs)
    show(mix.orderBy("source"), label="curated training mix per source")
    return mix


if __name__ == "__main__":
    main(get_example_spark())
