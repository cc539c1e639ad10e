"""Analytic breadth beyond the reference's own surface.

The reference has no rank/lag/lead, no grouping sets, no sessionization
(SURVEY §2 checklist, 'absent' items) -- but a user replacing it with this
engine gets them natively, and a training-data pipeline leans on them
(sessionized user histories, top-k sampling, rollup reporting).  Everything
here is a single window or aggregation -- one shuffle each, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..plans.event_relation import SEQ, TS


def event_deltas(df: DataFrame, partition_by: list[str], value: str = "value") -> DataFrame:
    """lag/lead/rank per key: previous/next event timestamps, inter-event
    gap seconds, and the event's value rank within its key."""
    w = Window.partitionBy(*partition_by).orderBy(F.col(TS), F.col(SEQ))
    wv = Window.partitionBy(*partition_by).orderBy(F.desc(value), F.col(SEQ))
    prev_ts = F.lag(TS).over(w)
    next_ts = F.lead(TS).over(w)
    return df.select(
        *partition_by, TS, SEQ, value,
        prev_ts.alias("prev_ts"),
        next_ts.alias("next_ts"),
        (F.unix_micros(F.col(TS)) - F.unix_micros(prev_ts)).alias("gap_us"),
        F.rank().over(wv).alias("value_rank"),
    )


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the gap
    from the previous event is >= ``gap_seconds``.  Session end is
    ``last_ts + gap`` -- identical to Spark's native ``session_window``
    merge semantics, so :func:`sessionize_native` returns the same rows.

    Two windows over one (key, ts) sort -- a single shuffle; at 100 TB the
    state is the window frame, nothing driver-side.
    """
    w = Window.partitionBy(key).orderBy(F.col(TS), F.col(SEQ))
    gap = F.unix_micros(F.col(TS)) - F.unix_micros(F.lag(TS).over(w))
    is_new = F.when(gap.isNull() | (gap >= gap_seconds * 1_000_000), 1).otherwise(0)
    df = df.withColumn("__new", is_new)
    df = df.withColumn(
        "session_id",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        df.groupBy(key, "session_id")
        .agg(
            F.min(TS).alias("session_start"),
            (F.max(TS) + F.expr(f"INTERVAL {gap_seconds} SECONDS")).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


def sessionize_native(
    df: DataFrame,
    key: str = "user_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Spark's built-in ``session_window`` -- same semantics as
    :func:`sessionize` (verified against the same SQL oracle); this is the
    form that also runs under Structured Streaming with watermark-driven
    session-state eviction."""
    sw = F.session_window(TS, f"{gap_seconds} seconds")
    out = (
        df.groupBy(F.col(key), sw.alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            key,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
    # session ids in (start-time) order per key, to align with sessionize()
    w = Window.partitionBy(key).orderBy("session_start")
    return out.withColumn("session_id", F.row_number().over(w).cast("long")).select(
        key, "session_id", "session_start", "session_end", "n_events", "sum_value"
    )


def rollup_agg(
    df: DataFrame, dims: list[str], aggs: dict[str, Column]
) -> DataFrame:
    """ROLLUP over ``dims`` (subtotals + grand total, null-filled dims)."""
    return df.rollup(*dims).agg(*[v.alias(k) for k, v in aggs.items()])


def top_k_per_group(
    df: DataFrame,
    group: list[str],
    order: list[Column],
    k: int = 3,
) -> DataFrame:
    """row_number-limited top-k inside each group -- the distributed top-k
    shape (per-partition heaps via the window sort, no global collect)."""
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def sole_contributor(
    candidates: DataFrame,
    group: str,
    actor: str,
    population: DataFrame | None = None,
    co_candidates: DataFrame | None = None,
) -> DataFrame:
    """Candidate rows whose ``actor`` is the ONLY candidate actor in its
    ``group``, among groups where another actor appears at all — the
    TPC-H Q21 correlation shape (suppliers who alone kept a shared order
    waiting):

    - EXISTS (another actor in the group)          -> left-semi self-join
    - NOT EXISTS (another CANDIDATE actor in it)   -> left-anti self-join

    both with the non-equi residual ``actor <> other.actor`` on top of
    the equi ``group`` key.  ``population`` defaults to ``candidates``
    (who counts as "another actor"); ``co_candidates`` defaults to
    ``candidates`` (who counts as a rival candidate).  Every probe side
    prunes to the two key columns, so at scale the shuffles carry
    ~16 bytes/row — or zero shuffles when the inputs share a bucketed
    layout on ``group`` (SCALE.md).
    """
    population = candidates if population is None else population
    co_candidates = candidates if co_candidates is None else co_candidates
    others = population.select(
        F.col(group).alias("__g2"), F.col(actor).alias("__a2")
    )
    rivals = co_candidates.select(
        F.col(group).alias("__g3"), F.col(actor).alias("__a3")
    )
    return (
        candidates.join(
            others,
            (F.col(group) == F.col("__g2")) & (F.col(actor) != F.col("__a2")),
            "left_semi",
        )
        .join(
            rivals,
            (F.col(group) == F.col("__g3")) & (F.col(actor) != F.col("__a3")),
            "left_anti",
        )
    )
