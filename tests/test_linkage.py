"""Fuzzy record linkage: semantics, blocking recall, and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from async_stream_processing_spark.operators.linkage import (
    blocked_levenshtein_join,
    fuzzy_self_pairs,
    token_blocks,
)

NAMES = [
    "red widget",
    "red widgets",       # dist 1 from "red widget"
    "red wadget",        # dist 1 from "red widget"
    "blue widget",       # dist 3 from "red widget" (out of band 2)
    "red gear",
    "red bear",          # dist 1 from "red gear"
    "copper pipe",       # isolated
    "crimson gear",
    "crimson bear",      # dist 1 from "crimson gear"
]


def _ents(spark):
    return spark.createDataFrame(
        [(n, i + 1) for i, n in enumerate(NAMES)], "name string, rid long"
    )


def test_self_pairs_find_expected_edges(spark):
    out = fuzzy_self_pairs(
        _ents(spark), key="name", text="name",
        blocks=token_blocks(first_n=1, last_n=1), max_dist=2,
    ).select("name_a", "name_b", "edit_distance").collect()
    got = {(r["name_a"], r["name_b"]): r["edit_distance"] for r in out}
    assert got[("red widget", "red widgets")] == 1
    assert got[("red wadget", "red widget")] == 1
    assert got[("red wadget", "red widgets")] == 2
    assert got[("red bear", "red gear")] == 1
    # dist 3 and the isolated entity never pair
    assert all("blue widget" not in p and "copper pipe" not in p for p in got)
    # ordered, exact-free (min_dist=1), no self pairs
    assert all(a < b for a, b in got)


def test_blocked_recall_vs_allpairs_ground_truth(spark):
    """Every true pair within distance 2 that SHARES a block is found;
    on this fixture the token blocks capture the full ground truth."""
    ents = _ents(spark)
    a = ents.select(F.col("name").alias("na"))
    truth = {
        tuple(sorted((r["na"], r["nb"])))
        for r in a.crossJoin(ents.select(F.col("name").alias("nb")))
        .filter(
            (F.col("na") < F.col("nb"))
            & F.levenshtein("na", "nb").between(1, 2)
        )
        .collect()
    }
    got = {
        (r["name_a"], r["name_b"])
        for r in fuzzy_self_pairs(
            ents, key="name", text="name",
            blocks=token_blocks(first_n=1, last_n=1), max_dist=2,
        ).collect()
    }
    assert got == truth


def test_two_relation_join_and_suffixes(spark):
    left = _ents(spark)
    right = _ents(spark).withColumnRenamed("rid", "rid2")
    out = blocked_levenshtein_join(
        left, right, "name", "name", "name", "name",
        blocks=token_blocks(first_n=1, last_n=1), max_dist=1,
    )
    cols = set(out.columns)
    assert {"name_a", "rid_a", "name_b", "rid2_b", "edit_distance"} <= cols
    # min_dist defaults to 0 for two-relation linkage: exact matches kept
    exact = out.filter(F.col("edit_distance") == 0)
    assert exact.count() == len(NAMES)


def test_max_block_size_caps_hot_blocks(spark):
    # five names share the hot block "f0:red"; capping at 4 drops it on
    # both sides, so pairs whose EVERY shared block is hot disappear
    # while pairs also sharing a small block survive
    ents = _ents(spark)
    uncapped = {
        (r["name_a"], r["name_b"])
        for r in fuzzy_self_pairs(
            ents, key="name", text="name",
            blocks=token_blocks(first_n=1, last_n=1), max_dist=2,
        ).collect()
    }
    capped = {
        (r["name_a"], r["name_b"])
        for r in fuzzy_self_pairs(
            ents, key="name", text="name",
            blocks=token_blocks(first_n=1, last_n=1), max_dist=2,
            max_block_size=4,
        ).collect()
    }
    assert capped <= uncapped
    assert ("red bear", "red gear") in uncapped
    assert ("red bear", "red gear") not in capped  # only hot block linked
    assert ("crimson bear", "crimson gear") in capped  # small block holds


def test_plan_has_no_cartesian_or_bnlj(spark):
    plan = fuzzy_self_pairs(
        _ents(spark), key="name", text="name",
        blocks=token_blocks(first_n=1, last_n=1), max_dist=2,
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_linkage_differential_random_configs(spark):
    """Randomized cross-engine differential for the blocking/edit-
    distance parity: random (first_n, last_n, max_dist) configs over
    the real part registry must produce the EXACT pair set on Spark and
    on DuckDB through the shared sql_token_blocked_self_pairs template
    — covering the parameter axis the single gate config cannot."""
    import random

    import duckdb

    from async_stream_processing_spark.operators.linkage import (
        sql_token_blocked_self_pairs,
    )
    from async_stream_processing_spark.sources.parquet import load_table

    sf = "/root/testdata/sf0.001"
    ents = (
        load_table(spark, sf, "part")
        .groupBy("p_name", "p_brand")
        .agg(F.count(F.lit(1)).alias("support"))
        .select(
            F.concat_ws(" ", "p_name", "p_brand").alias("name"), "support"
        )
        .localCheckpoint(eager=True)
    )
    con = duckdb.connect()
    src = (
        f"SELECT p_name || ' ' || p_brand AS name, COUNT(*) AS support "
        f"FROM '{sf}/part.parquet' GROUP BY p_name, p_brand"
    )
    rng = random.Random(20260817777)
    for _ in range(6):
        first_n = rng.choice([1, 2])
        last_n = rng.choice([1, 2])
        max_dist = rng.choice([1, 2, 3])
        min_dist = rng.choice([0, 1])
        got = {
            (r["name_a"], r["name_b"], r["edit_distance"],
             r["support_a"], r["support_b"])
            for r in fuzzy_self_pairs(
                ents, key="name", text="name",
                blocks=token_blocks(first_n=first_n, last_n=last_n),
                max_dist=max_dist, min_dist=min_dist,
            ).collect()
        }
        sql = sql_token_blocked_self_pairs(
            src, first_n=first_n, last_n=last_n,
            max_dist=max_dist, min_dist=min_dist, extra_cols=", support",
        )
        want = {
            (r.name_a, r.name_b, r.edit_distance, r.support_a, r.support_b)
            for r in con.execute(sql).df().itertuples()
        }
        assert got == want, (
            first_n, last_n, max_dist, min_dist,
            len(got), len(want), list(got ^ want)[:3],
        )
