"""Manifest-scale probe (r9 verdict item 7): prune latency vs file count.

Builds lakes whose HEAD manifest carries N synthetic file entries with
k-range stats (1 row of real data is irrelevant — pruning never opens
data files), checkpoints them, and times a needle range-prune through

* the JSON loop (parse the manifest + python-iterate every entry on
  the driver — O(N) driver work), vs
* the parquet checkpoint (Spark filter over the checkpoint relation,
  driver receives only survivors — flat in N).

Usage: python tools/probe_manifest_scale.py [Ns...]
Prints one line per (N, path); paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_lake(spark, n_files: int) -> str:
    """A lake whose head manifest lists ``n_files`` entries, each
    covering 100 consecutive k values, with real parquet behind only
    the needle range (pruning is metadata-only; the probe's scan reads
    just the surviving files)."""
    from async_stream_processing_spark.plans.versioned import (
        _manifest_path,
        _read_manifest,
        checkpoint_manifest,
        commit_append,
    )

    root = tempfile.mkdtemp(prefix="asp_mprobe_")
    lake = os.path.join(root, "lake")
    # one real file holding the needle range [0, 100)
    commit_append(
        spark.createDataFrame([(k, k) for k in range(100)],
                              "k long, v long").coalesce(1),
        lake, stats_cols=["k"],
    )
    m = _read_manifest(lake, 1)
    real = m["files"][0]
    files = [real] + [f"data/fake/{i:06d}.parquet"
                      for i in range(1, n_files)]
    stats = {real: m["stats"][real]}
    for i in range(1, n_files):
        stats[files[i]] = {"k": [i * 100, i * 100 + 99]}
    # publish a head whose manifest carries the synthetic entries
    body = {"version": 2, "parent": 1, "operation": "probe",
            "files": files, "stats": stats}
    with open(_manifest_path(lake, 2), "w") as f:
        json.dump(body, f)
    return lake


def time_checkpoint(spark, lake: str) -> tuple[float, int]:
    """Time the (sharded, r10 verdict item 5) checkpoint write and
    report the part-file count it produced."""
    from async_stream_processing_spark.plans.versioned import (
        _ckpt_dir,
        checkpoint_manifest,
    )

    t0 = time.time()
    checkpoint_manifest(spark, lake, version=2)
    dt = time.time() - t0
    parts = [p for p in os.listdir(_ckpt_dir(lake, 2))
             if p.startswith("part-") and p.endswith(".parquet")]
    return dt, len(parts)


def probe(spark, lake: str, reps: int = 5) -> tuple[float, float]:
    from async_stream_processing_spark.plans.versioned import (
        _pruned_files_distributed,
        _read_manifest,
    )

    ranges = {"k": (10, 60)}  # needle: survives only the real file

    def json_loop():
        m = _read_manifest(lake, 2)
        stats = m.get("stats", {})
        keep = []
        for f in m["files"]:
            s = stats.get(f, {}).get("k")
            if s is None or (s[0] <= 60 and s[1] >= 10):
                keep.append(f)
        return keep

    # warm both paths once (JVM/json module warmup)
    json_loop()
    _pruned_files_distributed(spark, lake, 2, ranges)
    t0 = time.time()
    for _ in range(reps):
        a = json_loop()
    t_json = (time.time() - t0) / reps
    t0 = time.time()
    for _ in range(reps):
        b, _dvs = _pruned_files_distributed(spark, lake, 2, ranges)
    t_ckpt = (time.time() - t0) / reps
    assert a == b, (len(a), len(b))
    assert len(a) == 1
    return t_json, t_ckpt


def main() -> None:
    ns = [int(x) for x in sys.argv[1:]] or [1000, 4000, 10000]
    from async_stream_processing_spark import get_spark

    spark = get_spark("mprobe", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'n_files':>8} {'json_loop_ms':>13} {'ckpt_prune_ms':>14} "
          f"{'ckpt_write_s':>13} {'shards':>7}")
    for n in ns:
        lake = build_lake(spark, n)
        t_write, n_parts = time_checkpoint(spark, lake)
        t_json, t_ckpt = probe(spark, lake)
        print(f"{n:>8} {t_json * 1000:>13.1f} {t_ckpt * 1000:>14.1f} "
              f"{t_write:>13.2f} {n_parts:>7}")
        shutil.rmtree(os.path.dirname(lake), ignore_errors=True)


if __name__ == "__main__":
    main()
