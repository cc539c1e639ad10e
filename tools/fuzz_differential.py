"""Differential query fuzzer: random relational expressions executed by
BOTH Spark and DuckDB from one AST, compared exactly.

The hand-written oracle gate proves the 123 declared queries; this tool
probes the space BETWEEN them -- filter/group/aggregate combinations
nobody wrote by hand -- for engine-behavior divergence (the SQLancer /
SparkFuzz idea, specialized to this repo's portability contract).

Every generated expression stays inside the repo's cross-engine
determinism rules (functions/numeric.py): integer aggregates, MIN/MAX,
COUNT, COUNT(DISTINCT), and decimal-exact SUM of 2-dp money -- no raw
double sums, no libm.  A divergence therefore indicates a real bug (in
a plan rewrite, a pushed predicate, null handling, type coercion), not
float noise.

Usage: python tools/fuzz_differential.py [n_cases] [seed] [sf_dir]
Also driven by tests/test_differential.py with pinned seeds.
"""

from __future__ import annotations

import random
import sys

# one AST node set, two renderers -------------------------------------------

FILTERS = [
    # (spark_condition, sql_condition) -- columns of the events table
    ("F.col('user_id') % {m} == {r}", "user_id % {m} = {r}"),
    ("F.col('value') >= {v}", "value >= {v}"),
    ("F.col('value') < {v}", "value < {v}"),
    ("F.col('event_type') == '{et}'", "event_type = '{et}'"),
    ("F.col('event_type') != '{et}'", "event_type <> '{et}'"),
    ("F.col('event_id') % {m} != {r}", "event_id % {m} <> {r}"),
    ("F.dayofmonth('ts') <= {d}", "EXTRACT(day FROM ts) <= {d}"),
]

GROUPS = [
    ("F.col('event_type')", "event_type", "g_et"),
    ("(F.col('user_id') % {k})", "user_id % {k}", "g_uk"),
    ("F.dayofmonth('ts')", "EXTRACT(day FROM ts)", "g_day"),
    ("(F.col('event_id') % {k})", "event_id % {k}", "g_ek"),
]

AGGS = [
    ("F.count(F.lit(1)).alias('n')", "COUNT(*) AS n"),
    ("F.countDistinct('user_id').alias('ndu')",
     "COUNT(DISTINCT user_id) AS ndu"),
    ("F.min('event_id').alias('mn')", "MIN(event_id) AS mn"),
    ("F.max('event_id').alias('mx')", "MAX(event_id) AS mx"),
    ("F.sum(F.col('value').cast('decimal(18,2)')).cast('double')"
     ".alias('sv')",
     "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv"),
    ("F.min('event_type').alias('met')", "MIN(event_type) AS met"),
]

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def gen_case(rng: random.Random) -> dict:
    """One random case as paired (spark_exprs, sql) renderings."""
    subs = {
        "m": rng.choice([2, 3, 5, 7, 11]),
        "r": rng.randint(0, 1),
        "v": round(rng.uniform(-50, 400), 2),
        "et": rng.choice(EVENT_TYPES),
        "d": rng.randint(1, 28),
        "k": rng.choice([2, 4, 8, 16]),
    }
    n_filters = rng.randint(0, 3)
    fs = rng.sample(FILTERS, n_filters) if n_filters else []
    n_groups = rng.randint(0, 2)
    gs = rng.sample(GROUPS, n_groups) if n_groups else []
    n_aggs = rng.randint(1, 3)
    ags = rng.sample(AGGS, n_aggs)
    return {
        "filters": [(s.format(**subs), q.format(**subs)) for s, q in fs],
        "groups": [(s.format(**subs), q.format(**subs), a) for s, q, a in gs],
        "aggs": ags,
        "subs": subs,
    }


def run_spark(spark, sf_dir: str, case: dict):
    from pyspark.sql import functions as F

    from async_stream_processing_spark.sources.parquet import load_table

    env = {"F": F}  # explicit eval env: comprehension scopes don't see it
    df = load_table(spark, sf_dir, "events")
    for s, _ in case["filters"]:
        df = df.filter(eval(s, env))
    group_cols = [eval(s, env).alias(alias) for s, _, alias in case["groups"]]
    agg_cols = [eval(s, env) for s, _ in case["aggs"]]
    if group_cols:
        out = df.groupBy(*group_cols).agg(*agg_cols)
    else:
        out = df.agg(*agg_cols)
    return out.toPandas()


def run_duckdb(con, case: dict):
    where = " AND ".join(q for _, q in case["filters"]) or "TRUE"
    groups = [(q, alias) for _, q, alias in case["groups"]]
    sel_groups = ", ".join(f"{q} AS {alias}" for q, alias in groups)
    sel_aggs = ", ".join(q for _, q in case["aggs"])
    select = ", ".join(x for x in (sel_groups, sel_aggs) if x)
    gb = f"GROUP BY {', '.join(q for q, _ in groups)}" if groups else ""
    return con.execute(
        f"SELECT {select} FROM events WHERE {where} {gb}"
    ).df()


def compare(spdf, ddf) -> str | None:
    import pandas as pd

    if len(spdf) != len(ddf):
        return f"rowcount {len(spdf)} vs {len(ddf)}"
    if sorted(spdf.columns) != sorted(ddf.columns):
        return f"columns {sorted(spdf.columns)} vs {sorted(ddf.columns)}"
    cols = sorted(spdf.columns)

    def norm(df):
        df = df.reindex(cols, axis=1).copy()
        for c in cols:
            if pd.api.types.is_integer_dtype(df[c]) or str(df[c].dtype) == "Int64":
                df[c] = df[c].astype("float64")  # unify int widths, keep exact (<2^53)
            elif pd.api.types.is_float_dtype(df[c]):
                df[c] = df[c].astype("float64")
        return df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)

    a, b = norm(spdf), norm(ddf)
    for c in cols:
        av, bv = a[c], b[c]
        if not (av.isna() == bv.isna()).all():
            return f"null placement differs in {c}"
        mask = ~av.isna()
        if av.dtype.kind == "f":
            if not (av[mask].to_numpy() == bv[mask].to_numpy()).all():
                return f"values differ in {c}"
        else:
            if not (av[mask] == bv[mask]).all():
                return f"values differ in {c}"
    return None


def fuzz(spark, con, sf_dir: str, n_cases: int, seed: int):
    rng = random.Random(seed)
    failures = []
    for i in range(n_cases):
        case = gen_case(rng)
        err = compare(run_spark(spark, sf_dir, case), run_duckdb(con, case))
        if err:
            failures.append((i, err, case))
    return failures


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260814
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    sys.path.insert(0, ".")
    import duckdb

    from async_stream_processing_spark import get_spark

    spark = get_spark("fuzz")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    failures = fuzz(spark, con, sf_dir, n, seed)
    for i, err, case in failures:
        print(f"FAIL case {i}: {err}\n  {case}")
    print(f"{'FAIL' if failures else 'PASS'}: {n - len(failures)}/{n} "
          f"(seed {seed}, {sf_dir})")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
