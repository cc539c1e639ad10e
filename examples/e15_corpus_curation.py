"""Corpus curation chain: the document-side pipeline a training run
feeds on — published Gopher quality/repetition filters, source-mixture
balancing, heavy-hitter vocabulary probes, and fixed-budget sequence
packing, composed as ONE DataFrame plan.

Every operator shown here is oracle-checked in `__spark_entry__.py`
(gopher_quality, gopher_repetition, mixture_sample, heavy_hitters,
pack_sequences); this example shows them composed: filter -> balance ->
pack, the order a real curation run uses.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from common import get_example_spark, show

SF_DIR = "/root/testdata/sf0.001"


def main(spark):
    from async_stream_processing_spark.llm.curation import (
        gopher_quality,
        gopher_repetition,
        mixture_sample,
        pack_sequences,
    )
    from async_stream_processing_spark.llm.text_analysis import heavy_hitters
    from async_stream_processing_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR, "documents")

    quality = gopher_quality(docs)
    repetition = gopher_repetition(docs)
    show(
        quality.groupBy("keep").count(),
        label="Gopher quality gate: kept vs filtered",
    )
    show(
        repetition.filter(~F.col("keep")).select(
            "doc_id", "top2_frac", "dup5_frac"
        ),
        n=5,
        label="repetition-flagged documents (boilerplate candidates)",
    )

    # keep documents passing BOTH rule families, then balance sources
    kept = (
        docs.join(quality.filter("keep").select("doc_id"), "doc_id")
        .join(repetition.filter("keep").select("doc_id"), "doc_id")
    )
    balanced = mixture_sample(kept)
    show(
        balanced.groupBy("source").count().orderBy("source"),
        n=5,
        label="per-source counts after mixture balancing",
    )

    show(
        heavy_hitters(kept, k=30),
        n=5,
        label="vocabulary heavy hitters (> n/30 of all tokens)",
    )

    packed = pack_sequences(
        kept.join(balanced.select("doc_id"), "doc_id"), budget=512
    )
    show(
        packed.groupBy("source", "chunk_id")
        .agg(F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("toks"))
        .orderBy("source", "chunk_id"),
        n=5,
        label="training chunks (512-token budget per source)",
    )
    return packed


if __name__ == "__main__":
    main(get_example_spark())
