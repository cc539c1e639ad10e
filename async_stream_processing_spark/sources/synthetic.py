"""Synthetic sources: timer ticks and evenly spaced timestamps.

Ports:

* ``asp.timer`` (``/root/reference/src/async_stream_processing/
  processor.py:140-150``): waits until ``start_time``, then fires every
  ``step`` until ``end_time``; the first firing is at ``start + step`` and
  the end check runs *after* firing, so a 10 s window with 1 s step fires
  exactly 10 times (asserted by tests/test_past.py:104-119).  Here a tick is
  a *row*: ``sequence(start + step, end, step)`` + ``explode`` -- inclusive
  end bound matches the reference's fire count exactly.
* ``testing.timestamps`` (testing.py:6-10): an infinite evenly spaced clock;
  bounded variant generated the same way.

Generated on executors via ``spark.range`` partitioning when ``n`` is huge;
the ``sequence`` builtin covers normal spans with zero Python cost.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def timer_ticks(
    spark: SparkSession,
    start: datetime | str,
    end: datetime | str,
    step: timedelta | str = "1 minute",
    col: str = "tick_ts",
) -> DataFrame:
    """Rows at ``start+step, start+2*step, ..., <= end`` (processor.py:140-150
    firing rule).  For spans of billions of ticks, split into per-partition
    subranges first; at test scale one ``sequence`` literal suffices."""
    if isinstance(step, timedelta):
        step = f"{int(step.total_seconds())} seconds"
    start_expr = F.lit(start).cast("timestamp") if isinstance(start, str) else F.lit(start)
    end_expr = F.lit(end).cast("timestamp") if isinstance(end, str) else F.lit(end)
    seq = F.sequence(
        start_expr + F.expr(f"INTERVAL {step}"), end_expr, F.expr(f"INTERVAL {step}")
    )
    return spark.range(1).select(F.explode(seq).alias(col))


def timestamps(
    spark: SparkSession,
    start: datetime | str,
    step: timedelta | str,
    n: int,
    col: str = "ts",
) -> DataFrame:
    """``n`` evenly spaced timestamps from ``start`` (testing.py:6-10).
    ``spark.range(n)`` distributes generation across executors."""
    if isinstance(step, timedelta):
        step_us = int(step.total_seconds() * 1_000_000)
    else:
        qty, unit = step.split()
        step_us = int(qty) * {
            "second": 1_000_000, "seconds": 1_000_000,
            "minute": 60_000_000, "minutes": 60_000_000,
            "hour": 3_600_000_000, "hours": 3_600_000_000,
        }[unit]
    start_expr = F.lit(start).cast("timestamp") if isinstance(start, str) else F.lit(start)
    return spark.range(n).select(
        F.timestamp_micros(
            F.unix_micros(start_expr) + F.col("id") * F.lit(step_us)
        ).alias(col)
    )
