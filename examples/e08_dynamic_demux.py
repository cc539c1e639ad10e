"""Dynamic per-key demux: runtime key discovery.

Mirrors ``/root/reference/examples/csp/06_advanced/e1_dynamic.py``:
``classify_orders`` spawns a sub-stream per newly seen symbol.  Spark has
no dynamic topology because keys are data: ``groupBy(symbol)`` handles an
unbounded, runtime-discovered key set; "new symbol detected" is the
first-seen marker.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import functions as F

from common import T0, get_example_spark, show


def main(spark):
    from async_stream_processing_spark.functions.numeric import exact_sum
    from async_stream_processing_spark.operators.dedup import (
        demux_summary,
        mark_first_seen,
    )

    orders = spark.createDataFrame(
        [
            (T0 + timedelta(seconds=1), 1, "AAPL", 100.0),
            (T0 + timedelta(seconds=2), 2, "GME", 20.0),
            (T0 + timedelta(seconds=3), 3, "AAPL", 101.0),
            (T0 + timedelta(seconds=4), 4, "TSLA", 200.0),
            (T0 + timedelta(seconds=5), 5, "GME", 21.0),
        ],
        "ts timestamp, seq long, symbol string, value double",
    )
    detected = mark_first_seen(orders, "symbol").filter("is_first")
    show(detected.select("ts", "symbol"), label="e1_dynamic: new symbol detected")
    per_key = demux_summary(
        orders, "symbol",
        aggs={"n_orders": F.count(F.lit(1)), "sum_value": exact_sum("value", 2)},
    )
    show(per_key.orderBy("symbol"), label="e1_dynamic: per-symbol sub-streams")
    return per_key


if __name__ == "__main__":
    main(get_example_spark())
