"""The bench stdout contract the driver parses: the LAST stdout line must
be a short self-contained JSON summary (round 1 lost the whole metric to
a truncated single long line -- this pins the fix)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_stdout_contract(tmp_path):
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_LIMIT="3",
        # never clobber the repo-root full-run BENCH_DETAIL.json
        SPARK_GRAFT_BENCH_DETAIL=str(tmp_path / "BENCH_DETAIL.json"),
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 2, lines
    detail = json.loads(lines[0])
    summary = json.loads(lines[1])
    # the driver captures a bounded TAIL: the last line must stand alone
    assert len(lines[1]) < 500
    assert summary["metric"] == "headline_queries_total"
    assert summary["unit"] == "sec"
    assert summary["n_queries"] == 3
    assert summary["value"] > 0
    assert set(detail["queries"]) == set(
        list(__import__("__spark_entry__").queries())[:3]
    )
    assert abs(sum(detail["queries"].values()) - summary["value"]) < 0.01
    # the side file honored the override path and matches stdout detail
    side = json.loads((tmp_path / "BENCH_DETAIL.json").read_text())
    assert side == detail
