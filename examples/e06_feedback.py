"""Algo <-> exchange feedback loop, unrolled.

Mirrors ``/root/reference/examples/csp/02_intermediate/e1_feedback.py``:
the algo sends an order, the exchange ACKs 0.7 s later, the algo reacts
0.3 s after that with the next order, 10 orders total.  Spark forbids
cyclic dataflow; the closed system is a recurrence, generated exactly
(SURVEY §7.3).
"""

from __future__ import annotations

from common import T0, get_example_spark, show


def main(spark):
    from async_stream_processing_spark.operators.feedback import feedback_orders

    out = feedback_orders(spark, T0, n_orders=10, ack_delay_ms=700, react_delay_ms=300)
    show(out, label="e1_feedback unrolled (order i at t0 + i*1s, ACK +0.7s)")
    return out


if __name__ == "__main__":
    main(get_example_spark())
