"""Feedback loop (SURVEY §2 B8) as a closed-form batch recurrence.

The reference's algo <-> exchange cycle
(``/root/reference/examples/csp/02_intermediate/e1_feedback.py:27-59``):
the algo sends order *i*, the exchange ACKs it ``ack_delay`` later, the algo
reacts ``react_delay`` after the ACK with order *i+1*, stopping after
``n_orders``.  Spark forbids cyclic streaming DAGs, but a *closed* feedback
system is a deterministic recurrence: order *i* is sent at
``t0 + i*(ack_delay + react_delay)`` -- so we *generate* the full timeline
declaratively (``sequence`` + ``explode``), which is exact and
embarrassingly parallel.  Open-loop (externally driven) feedback runs live
via a driver-side ``foreachBatch`` writing back to the input source -- see
``streaming/replay.py``.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def feedback_orders(
    spark: SparkSession,
    t0: datetime | str,
    n_orders: int = 10,
    ack_delay_ms: int = 700,
    react_delay_ms: int = 300,
) -> DataFrame:
    """Unrolled order/ACK timeline: one row per round trip.

    Columns: ``order_id`` (0-based), ``send_ts``, ``ack_ts``.  Matches the
    reference's e1_feedback timing (0.7 s ACK, 0.3 s reaction, 10 orders,
    ~1 s per round trip -- verified against the live run in SURVEY §2 B8).
    """
    t0_expr = F.lit(t0).cast("timestamp") if isinstance(t0, str) else F.lit(t0)
    round_us = (ack_delay_ms + react_delay_ms) * 1000
    return spark.range(n_orders).select(
        F.col("id").alias("order_id"),
        F.timestamp_micros(F.unix_micros(t0_expr) + F.col("id") * F.lit(round_us)).alias("send_ts"),
        F.timestamp_micros(
            F.unix_micros(t0_expr) + F.col("id") * F.lit(round_us) + F.lit(ack_delay_ms * 1000)
        ).alias("ack_ts"),
    )
