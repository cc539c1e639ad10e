"""The round-7 streaming-intake pipeline composed end-to-end: documents
ARRIVE through the streaming engine and pass, per micro-batch, the
gates a training-data intake runs before anything lands in the lake --

1. decontamination against the benchmark's Bloom sketch (driver model
   state, broadcast once),
2. near-dedup against the STORED corpus (one bucketed relation holds
   both the LSH buckets and the shingle sets; the corpus is never
   reshuffled),
3. quality scoring with the trained perceptron (stateless per-row fold
   -- train offline, score on ingest),

and the embedding side of the same intake: a new vector batch merged
into the cell-partitioned IVF-PQ store touching only its own cells.

Every operator here is oracle-checked in `__spark_entry__.py`
(stream_decontaminate, stream_incremental_dedup,
stream_perceptron_score, ivfpq_upsert / stream_ivfpq_upsert); this
example shows the composed lifecycle.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import functions as F

from common import get_example_spark, show

SF_DIR = "/root/testdata/sf0.001"


def main(spark):
    from async_stream_processing_spark.llm.classifier import (
        perceptron_score_narrow,
        perceptron_train_weights,
    )
    from async_stream_processing_spark.llm.decontaminate import (
        bloom_decontaminate,
    )
    from async_stream_processing_spark.llm.dedup import (
        corpus_bucket_sets,
        stream_incremental_dedup,
    )
    from async_stream_processing_spark.llm.similarity import (
        ivfpq_encode,
        ivfpq_upsert,
        ivfpq_write_store,
    )
    from async_stream_processing_spark.plans.scale import write_bucketed
    from async_stream_processing_spark.sources.parquet import (
        load_table,
        stream_table,
    )
    from async_stream_processing_spark.streaming.replay import drain

    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)       # the stored lake
    bench = docs.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("bench_id"), "text"
    )

    # --- offline: persist the dedup store, train the quality model ---
    table = "e20_corpus_sets_" + uuid.uuid4().hex[:8]
    store_dir = tempfile.mkdtemp(prefix="e20_store_")
    write_bucketed(
        corpus_bucket_sets(corpus), table=table, bucket_by="sig",
        n_buckets=8, sort_by="sig", path=store_dir,
    )
    weights = perceptron_train_weights(corpus, n_buckets=64, n_rounds=2)

    try:
        arriving = stream_table(spark, SF_DIR, "documents").filter(
            F.col("doc_id") % 5 == 0
        )

        # gate 1: benchmark contamination, flagged on ingest
        contaminated = drain(
            bloom_decontaminate(arriving, bench, n=8),
            output_mode="complete",
        )
        show(contaminated, n=5, label="intake gate 1: benchmark collisions")

        # gate 2: near-dup vs the stored corpus, zero corpus exchange
        dups = drain(
            stream_incremental_dedup(
                arriving, spark.table(table), threshold=0.25
            ),
            output_mode="append",
        )
        show(dups, n=5, label="intake gate 2: near-dups vs stored corpus")

        # gate 3: quality margin, stateless per-row scoring
        scored = drain(
            perceptron_score_narrow(arriving, weights, n_buckets=64),
            output_mode="append",
        )
        show(
            scored.groupBy("pred").count().orderBy("pred"),
            n=2,
            label="intake gate 3: perceptron keep/drop split",
        )

        # embedding side: upsert the arriving vectors into the ANN store
        emb = load_table(spark, SF_DIR, "embeddings")
        ann_store = tempfile.mkdtemp(prefix="e20_ann_")
        shutil.rmtree(ann_store)
        try:
            codes, coarse, rcode = ivfpq_encode(
                emb.filter(F.col("vec_id") % 50 != 37)
            )
            ivfpq_write_store(codes, ann_store)
            touched = ivfpq_upsert(
                spark, ann_store,
                emb.filter(F.col("vec_id") % 50 == 37), coarse, rcode,
            )
            print(f"ANN store upsert touched cells: {touched}")
        finally:
            shutil.rmtree(ann_store, ignore_errors=True)

        return scored
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(store_dir, ignore_errors=True)


if __name__ == "__main__":
    main(get_example_spark())
