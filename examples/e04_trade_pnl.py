"""Trade PnL mark-to-market: quotes + trades, as-of join.

Mirrors ``/root/reference/examples/csp/01_basics/e4_trade_pnl.py``: quotes
update the mid (= (bid+ask)/2); each trade is marked at the latest mid as
of its event time; positions accumulate per side.  The reference's
``Book``/``Positions`` callbacks become an as-of join plus a keyed
aggregation.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import functions as F

from common import T0, get_example_spark, show


def main(spark):
    from async_stream_processing_spark.operators.positions import (
        mark_to_market,
        positions,
    )

    # quote stream (e4:73-90): (ts, bid?, ask?) -> carry to mid
    quotes = spark.createDataFrame(
        [
            (T0 + timedelta(seconds=0.5), 1, 100.0, 101.0),
            (T0 + timedelta(seconds=1.3), 2, 100.5, 101.5),
            (T0 + timedelta(seconds=2.2), 3, 101.0, 102.0),
        ],
        "ts timestamp, seq long, bid double, ask double",
    ).withColumn("mid", (F.col("bid") + F.col("ask")) / 2)

    # trade stream (e4:91-98): qty signed by side
    trades = spark.createDataFrame(
        [
            (T0 + timedelta(seconds=1.0), (1 << 40) + 1, "buy", 100, 101.0),
            (T0 + timedelta(seconds=2.0), (1 << 40) + 2, "sell", 50, 100.8),
            (T0 + timedelta(seconds=3.0), (1 << 40) + 3, "buy", 25, 101.6),
        ],
        "ts timestamp, seq long, side string, qty long, price double",
    )

    marked = mark_to_market(trades, quotes.select("ts", "seq", "mid"),
                            qty="qty", price="price").orderBy("ts")
    show(marked.select("ts", "side", "qty", "price", "mid", "pnl"),
         label="e4 mark-to-market (as-of join)")
    pos = positions(trades, key="side", qty="qty", price="price")
    show(pos, label="e4 positions per side")
    return marked


if __name__ == "__main__":
    main(get_example_spark())
