"""Streaming keyed-upsert sink on plain parquet (no table format).

Structured Streaming's built-in file sink is append-only; real pipelines
need MERGE semantics (latest state per key) for dimension snapshots,
session rollups, feature stores.  Table formats (Delta/Iceberg/Hudi) do
this with transaction logs; this module is the minimal lake-native
equivalent for environments without one:

* per micro-batch, reduce the batch to one row per key (greatest
  ``(version_col)`` wins, ties by the batch's own order column);
* merge with the CURRENT lake state -- but only the HASH PARTITIONS of
  the lake that the batch touches: keys are bucketed into
  ``n_buckets`` directories by a stable hash, so a batch touching k
  buckets rewrites k/n_buckets of the lake, not all of it (the same
  dynamic-partition-overwrite discipline as ``write_partitioned_lake``);
* rewrite those buckets atomically via dynamic partition overwrite.

Exactly-once: foreachBatch can re-deliver a batch after recovery; the
merge is IDEMPOTENT (merging the same rows twice yields the same lake),
which is the standard foreachBatch exactly-once recipe.

At 100 TB: bucket count sizes the rewrite amplification (each upsert
rewrites touched buckets in full).  A table format replaces the bucket
rewrite with log appends + compaction; the INTERFACE here (merge_batch /
upsert_sink) stays the same, so swapping the backend is local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

BUCKET_COL = "__bucket"


def _latest_per_key(df: DataFrame, keys: list[str], version_col: str) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(F.desc(version_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _with_bucket(df: DataFrame, keys: list[str], n_buckets: int) -> DataFrame:
    key_str = F.concat_ws("\x1f", *[F.col(k).cast("string") for k in keys])
    return df.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(key_str), F.lit(n_buckets)).cast("int")
    )


def merge_batch(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    keys: list[str],
    version_col: str,
    n_buckets: int = 16,
) -> None:
    """Merge one (micro-)batch into the keyed lake at ``path``.

    Reads ONLY the hash buckets the batch touches, unions them with the
    batch, keeps the max-version row per key, and dynamically overwrites
    just those bucket directories.
    """
    import os

    batch = _with_bucket(
        _latest_per_key(batch, keys, version_col), keys, n_buckets
    )
    touched = [r[BUCKET_COL] for r in batch.select(BUCKET_COL).distinct().collect()]
    if not touched:
        return
    merged = batch
    if os.path.exists(path):
        current = spark.read.parquet(path).filter(F.col(BUCKET_COL).isin(touched))
        # new rows win over stored rows at EQUAL version (deterministic
        # re-delivery: replaying the same batch is a no-op)
        both = batch.withColumn("__src", F.lit(1)).unionByName(
            current.withColumn("__src", F.lit(0))
        )
        w = Window.partitionBy(*keys).orderBy(
            F.desc(version_col), F.desc("__src")
        )
        merged = (
            both.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__src")
        )
    # dynamic overwrite as a PER-WRITE option, not session conf: SQLConf
    # is thread-local, and this merge usually runs inside foreachBatch on
    # the micro-batch thread, where the query's CLONED session is active
    # -- a session-level conf.set from the driver thread is invisible
    # there, and static mode would replace the whole lake with the
    # touched buckets (a sparse batch then silently drops every other
    # bucket; regression-tested in test_streaming.py)
    (
        merged.repartition(len(touched), F.col(BUCKET_COL))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BUCKET_COL)
        .parquet(path)
    )


def upsert_sink(
    stream: DataFrame,
    path: str,
    keys: list[str],
    version_col: str,
    checkpoint: str,
    n_buckets: int = 16,
    available_now: bool = True,
):
    """Attach the keyed-merge sink to a streaming DataFrame.

    Returns the started StreamingQuery; callers ``awaitTermination()``.
    """
    spark = stream.sparkSession

    def _each(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch(spark, batch_df, path, keys, version_col, n_buckets)

    writer = (
        stream.writeStream.foreachBatch(_each)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_current(spark: SparkSession, path: str) -> DataFrame:
    """Current state of the upsert lake (one row per key), bucket column
    dropped."""
    return spark.read.parquet(path).drop(BUCKET_COL)
