"""Profile declared queries: cold+warm noop-sink timing + formatted plan.

Usage: python tools/profile_queries.py out_dir name [name ...]
Writes plans to out_dir/<name>_before.txt (or _after.txt with
PROFILE_SUFFIX=after) and prints one timing line per query.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suffix = os.environ.get("PROFILE_SUFFIX", "before")
    runs = int(os.environ.get("PROFILE_RUNS", "2"))
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entrymod
    from async_stream_processing_spark import get_spark

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = entrymod.queries()

    for name in names:
        fn = qs[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # pragma: no cover
            print(f"{name}: PLAN FAILED {e}", flush=True)
            continue
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        times = []
        for _ in range(runs):
            spark.catalog.clearCache()
            gc.collect()  # detach py4j handles: isolate runs (bench.py)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 2))
        print(f"{name}: {times}", flush=True)


if __name__ == "__main__":
    main()
