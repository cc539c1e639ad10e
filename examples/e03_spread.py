"""Bid/ask spread with last-value semantics.

Mirrors ``/root/reference/examples/csp/01_basics/e3_show_graph.py``: the
spread (ask - bid) is emitted on every tick once both sides have ticked at
least once.
"""

from __future__ import annotations

from common import get_example_spark, series, show


def main(spark):
    from async_stream_processing_spark.operators.running import spread

    bid = series(spark, [(0, 99.0), (1, 99.5), (3, 99.25)], stream_id=0)
    ask = series(spark, [(0.5, 100.5), (2, 100.75)], stream_id=1)
    out = spread(bid, ask).orderBy("ts", "seq")
    show(out.select("ts", "bid", "ask", "spread"), label="e3_show_graph spread")
    return out


if __name__ == "__main__":
    main(get_example_spark())
