"""Running aggregation over two ticking series.

Mirrors ``/root/reference/examples/csp/01_basics/e2_ticking.py``:
``Calculator.new_value`` keeps the last x and y, emits ``x+y`` and a
running accumulator on every tick of either series.  Here the two series
merge on the global (ts, seq) order, last values carry forward, and the
accumulator is a cumulative window sum.
"""

from __future__ import annotations

from common import get_example_spark, series, show


def main(spark):
    from async_stream_processing_spark.operators.running import running_combine

    x = series(spark, [(0, 1), (1, 2), (2, 3), (3, 4)], stream_id=0)
    y = series(spark, [(0.5, 10), (2.5, 20)], stream_id=1)
    out = running_combine(x, y).orderBy("ts", "seq")
    show(out.select("ts", "x", "y", "xy_sum", "accum"), label="e2_ticking")
    return out


if __name__ == "__main__":
    main(get_example_spark())
