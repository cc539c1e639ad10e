"""Time a subset of declared queries warm (2 runs, keep the best).

Usage: python tools/bench_queries.py q1 q2 ...  [--sf=/root/testdata/sf0.1]
Prints one line per query: name, cold, warm seconds.  For A/B work only --
the round's official numbers come from bench.py (full registry, one pass).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]

    import __spark_entry__ as entrymod
    from async_stream_processing_spark import get_spark

    spark = get_spark("bench-sub")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = entrymod.queries()
    for name in args:
        times = []
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        print(f"{name}: cold={times[0]} warm={times[1]}", flush=True)


if __name__ == "__main__":
    main()
