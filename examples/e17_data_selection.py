"""Data selection for pretraining: the round-5 curation additions
composed into one selection flow — C4 page cleanup, the full 12-signal
Gopher repetition gate, DSIR importance scoring toward a target
subcorpus, n-gram novelty ranking, and the source-overlap matrix that
decides dedup ordering.

Every operator here is oracle-checked in `__spark_entry__.py`
(c4_quality, gopher_repetition_full, dsir_score, ngram_novelty,
source_overlap, cms_token_counts); this example shows the composition a
real selection run uses: clean -> gate -> score -> rank.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from common import get_example_spark, show

SF_DIR = "/root/testdata/sf0.001"


def main(spark):
    from async_stream_processing_spark.llm.curation import (
        c4_quality,
        gopher_repetition_full,
    )
    from async_stream_processing_spark.llm.importance import dsir_score
    from async_stream_processing_spark.llm.text_analysis import (
        cms_token_counts,
        ngram_novelty,
        source_overlap,
    )
    from async_stream_processing_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR, "documents")

    c4 = c4_quality(docs)
    gopher = gopher_repetition_full(docs)
    show(c4.groupBy("keep").count(), label="C4 page gate: kept vs dropped")
    show(
        gopher.filter(~F.col("keep"))
        .select("doc_id", "dup_line", "dup5_chars", "dup10_chars"),
        n=5,
        label="full-Gopher repetition rejects",
    )

    # overlap matrix: which sources duplicate each other (dedup ordering)
    show(
        source_overlap(docs).orderBy(F.desc("jaccard")),
        n=5,
        label="most-overlapping source pairs",
    )

    # importance scoring toward the src0 'target domain' and novelty
    scored = dsir_score(docs, target_source="src0").join(
        ngram_novelty(docs), "doc_id"
    )
    ranked = scored.select(
        "doc_id", "score_scaled", "novelty_frac"
    ).orderBy(F.desc("score_scaled"))
    show(ranked, n=5, label="DSIR-leaning docs (target-domain-like)")

    # bounded-state vocabulary probe over whatever survives the gates
    kept = docs.join(gopher.filter("keep").select("doc_id"), "doc_id")
    top = cms_token_counts(kept, k=10)
    show(top, n=10, label="CMS top-10 tokens of the kept corpus")
    return ranked


if __name__ == "__main__":
    spark = get_example_spark("e17-data-selection")
    main(spark)
