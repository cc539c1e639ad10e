"""Sliding-window VWAP sampled by a periodic timer.

Mirrors ``/root/reference/examples/csp/02_intermediate/e2_stats.py``:
``MovingAverage`` keeps a 2-minute (here 10 s, to match the inline data)
buffer of (value, weight) and answers sum(v*w)/sum(w); a periodic timer
samples it alongside cumulative volume.  The buffer is a range-frame
window; the sampling timer is a tumbling-window resample.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from common import get_example_spark, series, show


def main(spark):
    from async_stream_processing_spark.functions.numeric import exact_sum
    from async_stream_processing_spark.operators.windows import (
        cumulative_sum,
        resample,
        sliding_weighted_mean,
    )

    ticks = series(
        spark, [(i, 100 + (i * 7) % 13) for i in range(0, 30, 2)]
    ).withColumn("vol", (F.col("seq") % 5 + 1).cast("long"))

    vwap = sliding_weighted_mean(
        ticks, value="value", weight="vol", interval_seconds=10, out="vwap_10s"
    )
    vwap = cumulative_sum(vwap, value="vol", out="cum_vol", scale=0)
    show(vwap.orderBy("ts").select("ts", "value", "vol", "vwap_10s", "cum_vol"),
         n=15, label="e2_stats sliding VWAP + cumulative volume")

    sampled = resample(
        ticks, every="10 seconds",
        aggs={"n": F.count(F.lit(1)), "sum_value": exact_sum("value", 2)},
    )
    show(sampled.orderBy("bucket_start"), label="e2_stats periodic sample (timer)")
    return vwap


if __name__ == "__main__":
    main(get_example_spark())
