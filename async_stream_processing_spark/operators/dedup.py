"""First-seen detection / dedup (SURVEY §2 B1) and dynamic demux (B12).

* ``Greeter`` (``/root/reference/examples/common.py:25-34``) keeps a seen-set
  per key and distinguishes the first occurrence ("Hello X") from repeats
  ("Hello again X").  Declaratively: ``row_number() OVER (PARTITION BY key
  ORDER BY ts, seq) = 1``.
* ``classify_orders`` (``e1_dynamic.py:32-40``) spawns a sub-stream per
  newly seen key -- dynamic topology.  In Spark, keys are data:
  ``groupBy(key)`` / ``partitionBy(key)`` covers unbounded runtime key sets
  natively, so demux is just a keyed aggregation plus the first-seen marker.

Streaming variants live in ``streaming/`` (``dropDuplicatesWithinWatermark``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..plans.event_relation import SEQ, TS


def first_seen(df: DataFrame, key: list[str] | str) -> DataFrame:
    """Keep only each key's first event in ``(ts, seq)`` order."""
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(F.col(TS), F.col(SEQ))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def mark_first_seen(df: DataFrame, key: list[str] | str, out: str = "is_first") -> DataFrame:
    """All events, with a boolean first-occurrence marker (Greeter's
    hello / hello-again split)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(F.col(TS), F.col(SEQ))
    return df.withColumn(out, F.row_number().over(w) == 1)


def demux_summary(df: DataFrame, key: str, aggs: dict[str, Column] | None = None) -> DataFrame:
    """B12: per dynamically discovered key, first-seen time + aggregates.
    One shuffle; unbounded key cardinality is native."""
    aggs = aggs or {"n_events": F.count(F.lit(1))}
    return df.groupBy(key).agg(
        F.min(F.struct(TS, SEQ)).getField(TS).alias("first_ts"),
        *[v.alias(k) for k, v in aggs.items()],
    )
