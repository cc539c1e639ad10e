"""Differential fuzzing: random relational expressions executed by both
Spark and DuckDB from one AST must agree exactly (tools/fuzz_differential).

The expression grammar stays inside the repo's portability contract
(integer aggregates, decimal-exact sums), so ANY divergence is a real
engine-behavior bug, not float noise.  Pinned seed keeps CI
deterministic; run the tool standalone with fresh seeds for exploration.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.fuzz_differential import fuzz  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_differential_fuzz_pinned_seed(spark):
    con = duckdb.connect()
    for t in ("events", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    failures = fuzz(spark, con, SF, n_cases=25, seed=20260814)
    assert not failures, failures[:3]


def test_differential_fuzz_streaming_vs_batch(spark):
    """Same random ASTs through the micro-batch engine (complete-mode
    drain) vs the batch planner: three execution paths, one semantic."""
    from tools.fuzz_differential import fuzz_streaming

    failures = fuzz_streaming(spark, SF, n_cases=10, seed=20260814)
    assert not failures, failures[:3]


def test_differential_fuzz_window_functions(spark):
    """Window-function grammar (row_number/rank/lag/lead/windowed
    aggregates over a unique total order): row-for-row exact across
    engines -- no aggregation to collapse a divergence."""
    from tools.fuzz_differential import fuzz_window

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    failures = fuzz_window(spark, con, SF, n_cases=15, seed=20260814)
    assert not failures, failures[:3]


def test_differential_fuzz_scalar_expressions(spark):
    """Scalar/projection grammar (integer arithmetic, string structure,
    date parts, CASE): row-for-row exact -- probes the expression and
    codegen layer directly."""
    from tools.fuzz_differential import fuzz_scalar

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    failures = fuzz_scalar(spark, con, SF, n_cases=15, seed=20260814)
    assert not failures, failures[:3]
