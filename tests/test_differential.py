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


def test_comparator_detects_planted_divergences():
    """The fuzz harness is only as good as its comparator: plant
    divergences and assert compare() flags each (guards against a
    silently-vacuous equality check)."""
    import pandas as pd

    from tools.fuzz_differential import compare

    base = pd.DataFrame({"a": [1, 2, 3], "b": [1.5, 2.5, None]})
    assert compare(base, base.copy()) is None
    # value flip
    v = base.copy(); v.loc[1, "a"] = 99
    assert compare(base, v) is not None
    # float ulp-level flip
    f = base.copy(); f.loc[0, "b"] = 1.5000000000000002
    assert compare(base, f) is not None
    # null placement
    n = base.copy(); n.loc[0, "b"] = None; n.loc[2, "b"] = 9.0
    assert compare(base, n) is not None
    # row count
    assert compare(base, base.iloc[:2]) is not None
    # column set
    c = base.rename(columns={"b": "z"})
    assert compare(base, c) is not None


def test_fuzz_full_path_catches_mutated_oracle(spark):
    """End-to-end sensitivity: run a real case but mutate the SQL side
    (drop the filters) -- the harness must report a divergence whenever
    the filter was selective."""
    import random

    from tools.fuzz_differential import (
        compare,
        gen_case,
        run_duckdb,
        run_spark,
    )

    con = duckdb.connect()
    for t in ("events", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    rng = random.Random(5)
    caught = total = 0
    while total < 5:
        case = gen_case(rng)
        if not case["filters"] or case.get("join") == (None, None, None):
            continue
        mutated = dict(case, filters=[])
        # only mutations that actually change the result test the
        # comparator (a groupless MIN/COUNT can be filter-insensitive);
        # ground truth from Spark itself keeps this grammar-mix-proof
        if compare(run_spark(spark, SF, case),
                   run_spark(spark, SF, mutated)) is None:
            continue
        spdf = run_spark(spark, SF, case)
        odf = run_duckdb(con, mutated)
        total += 1
        if compare(spdf, odf) is not None:
            caught += 1
    assert caught == total == 5, (caught, total)


def test_differential_fuzz_text_expressions(spark):
    """Text/array grammar over the documents table (split, slice,
    distinct, sort, join-back-to-string, substring, md5, strpos,
    replace): row-for-row exact -- the string layer the curation
    operators stand on."""
    from tools.fuzz_differential import fuzz_text

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    failures = fuzz_text(spark, con, SF, n_cases=20, seed=20260814)
    assert not failures, failures[:3]


def test_differential_fuzz_array_expressions(spark):
    """ARRAY grammar (round 7): transform / filter / aggregate folds /
    slice / distinct / element_at over the token array -- the narrow
    per-row layer the zero-shuffle signature, winnowing, and scoring
    plans all stand on; row-for-row exact across engines."""
    from tools.fuzz_differential import fuzz_array

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    failures = fuzz_array(spark, con, SF, n_cases=20, seed=20260814)
    assert not failures, failures[:3]


def test_differential_fuzz_rollup_pinned_seed(spark):
    """Grouping-sets grammar: random dims x {ROLLUP, CUBE, GROUPING
    SETS} with GROUPING() flags and portable integer aggregates, the
    multi-dimensional-aggregate layer revenue_rollup / cube_orders stand
    on; one ANSI string run through BOTH engines."""
    from tools.fuzz_differential import fuzz_rollup

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    failures = fuzz_rollup(spark, con, SF, n_cases=15, seed=20260814)
    assert not failures, failures[:3]


def test_differential_fuzz_setop_pinned_seed(spark):
    """Set-operation grammar: 2-3 branches x {UNION, INTERSECT, EXCEPT}
    x {distinct, ALL} with explicit parens -- bag-vs-set semantics and
    ALL-variant duplicate counting, one ANSI string through both
    engines."""
    from tools.fuzz_differential import fuzz_setop

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    failures = fuzz_setop(spark, con, SF, n_cases=15, seed=20260814)
    assert not failures, failures[:3]


def test_differential_fuzz_subquery_pinned_seed(spark):
    """Subquery grammar: correlated [NOT] EXISTS, [NOT] IN, and scalar
    aggregate comparisons -- probes the decorrelation layer (subquery ->
    join rewrites) through one ANSI string in both engines."""
    from tools.fuzz_differential import fuzz_subquery

    con = duckdb.connect()
    for t in ("events", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    failures = fuzz_subquery(spark, con, SF, n_cases=15, seed=20260814)
    assert not failures, failures[:3]


def test_differential_fuzz_multijoin_pinned_seed(spark):
    """Three-table join chains (events -> customer -> nation), INNER or
    LEFT at each hop, dims from all three tables -- join reordering and
    null-extension through chained LEFT joins, one ANSI string in both
    engines."""
    from tools.fuzz_differential import fuzz_multijoin

    con = duckdb.connect()
    for t in ("events", "customer", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    failures = fuzz_multijoin(spark, con, SF, n_cases=15, seed=20260814)
    assert not failures, failures[:3]
