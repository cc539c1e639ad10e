"""Time-window operators: sliding weighted means (VWAP) and resampling.

Reference semantics ported here:

* ``MovingAverage`` (``/root/reference/examples/csp/02_intermediate/e2_stats.py:35-65``)
  keeps a ``(event_time, value, weight)`` buffer, prunes rows older than
  ``t - interval`` on insert, and answers ``sum(v*w)/sum(w)`` -- i.e. a
  **time-range sliding window weighted mean** evaluated at every event.
* The 1-minute sampling ``timer`` (e2_stats.py:73-96) that also prints the
  cumulative volume maps to a tumbling-window aggregation (resample).

Spark disposition: the buffer *is* a window frame --
``Window.orderBy(ts).rangeBetween(-interval, 0)`` -- so state management,
pruning and spilling are the engine's problem, not ours.  At scale, a global
``orderBy`` window serializes; partition by a stream key whenever the query
has one (the reference's buffers are per-instrument too).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import dec


def _range_window(partition_by: list[str], seconds: int, order_col: str | None = None):
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    # RANGE frame over epoch-MICROseconds (full timestamp precision; the
    # reference prunes on raw datetimes, e2_stats.py:63-65).  Peers with
    # equal ts share a frame in both Spark and ANSI SQL, so tie-stable.
    # Passing a materialized ``order_col`` lets downstream windows ordering
    # by (order_col, ...) reuse this window's sort (same attribute id).
    order = F.col(order_col) if order_col else F.unix_micros("ts")
    return w.orderBy(order).rangeBetween(-seconds * 1_000_000, 0)


def sliding_weighted_mean(
    df: DataFrame,
    value: str = "value",
    weight: str | Column | None = None,
    interval_seconds: int = 120,
    partition_by: list[str] | None = None,
    out: str = "wmean",
    value_scale: int = 2,
    weight_scale: int = 0,
    order_col: str | None = None,
) -> DataFrame:
    """Per-event ``sum(v*w)/sum(w)`` over the trailing ``interval_seconds``.

    ``weight=None`` degenerates to the plain sliding mean.  Sums are decimal
    (order-independent) per ``functions.numeric``; pass the columns' true
    scales so totals stay within double-exact range (numeric.py rule).
    """
    partition_by = partition_by or []
    w = _range_window(partition_by, interval_seconds, order_col)
    v = F.col(value)
    if weight is None:
        num = F.sum(dec(v, value_scale)).over(w).cast("double")
        den = F.count(v).over(w).cast("double")
    else:
        # decimal x decimal product of SOURCE columns -- exact and
        # DuckDB-portable (see functions.numeric module rule).
        wt = F.col(weight) if isinstance(weight, str) else weight
        num = F.sum(dec(v, value_scale) * dec(wt, weight_scale)).over(w).cast("double")
        den = F.sum(dec(wt, weight_scale)).over(w).cast("double")
    return df.withColumn(out, num / den)


def cumulative_sum(
    df: DataFrame,
    value: str = "value",
    order: list[str | Column] = ("ts", "seq"),
    partition_by: list[str] | None = None,
    out: str = "cum_sum",
    scale: int = 6,
) -> DataFrame:
    """Running total in the reference's strict event order (SURVEY §3.4).

    Mirrors the cumulative-volume accumulator of e2_stats.py:87-96 and the
    ``accum`` of e2_ticking.py:10-27.  ``order`` accepts Columns so a
    caller stacking this on a range-frame window can share its sort key
    (e.g. ``[F.unix_micros("ts"), "seq"]`` -- Spark then elides the second
    per-partition sort because the first's key is a prefix).
    """
    base = Window.partitionBy(*(partition_by or []))
    keys = [F.col(c) if isinstance(c, str) else c for c in order]
    w = base.orderBy(*keys).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out, F.sum(dec(value, scale)).over(w).cast("double"))


def resample(
    df: DataFrame,
    every: str = "1 minute",
    aggs: dict[str, Column] | None = None,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window aggregation (the reference's periodic sampling timer,
    processor.py:140-150 driving e2_stats.py:91-96).

    Emits one row per non-empty bucket keyed by ``bucket_start`` (we use
    ``date_trunc`` rather than ``window()`` so the schema is a plain
    timestamp, directly comparable to an ANSI-SQL oracle).  Works unchanged
    as a streaming aggregation when fed a streaming DataFrame with a
    watermark (swap date_trunc for ``window()`` there -- see streaming/).
    """
    qty_s, unit = every.split()
    qty = int(qty_s)
    unit = unit.rstrip("s")  # "1 minute" -> "minute"
    if qty == 1:
        bucket = F.date_trunc(unit, F.col("ts"))
    else:
        step_us = qty * {"second": 10**6, "minute": 60 * 10**6,
                         "hour": 3600 * 10**6, "day": 86400 * 10**6}[unit]
        bucket = F.timestamp_micros(
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts")) % step_us)
        )
    keys = [bucket.alias("bucket_start")] + [F.col(c) for c in (partition_by or [])]
    aggs = aggs or {"n_events": F.count(F.lit(1))}
    return df.groupBy(*keys).agg(*[v.alias(k) for k, v in aggs.items()])
