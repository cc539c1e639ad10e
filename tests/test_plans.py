"""Physical-plan regression guards: lock in the 100 TB-relevant plan
shapes (shuffle counts, broadcast placement, filter pushdown) for key
queries so an innocent refactor can't silently regress them.  The full
audit lives in PLANS.md; these pin the load-bearing facts."""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    import __spark_entry__ as m

    return m.queries()[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def _shuffles(plan: str) -> int:
    return len(re.findall(
        r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan
    ))


def test_vwap_single_sort_single_exchange(spark):
    """Flagship: cumulative + range windows share ONE exchange and ONE
    sort (the second window's key is a prefix of the first's)."""
    plan = _plan(spark, "vwap_2min")
    assert _shuffles(plan) == 1
    assert plan.count("Sort ") + plan.count("Sort[") == 1 or len(
        re.findall(r"\bSort\b", plan)) == 1


def test_q19_single_broadcast_join_with_pushdown(spark):
    """Disjunctive branches share one join; part-side disjunction and the
    derived quantity envelope both reach the scans."""
    plan = _plan(spark, "tpch_q19")
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan
    # toString() may truncate long filter lists -- match per line
    pushed = re.findall(r"PushedFilters: \[([^\n]*)", plan)
    assert len(pushed) == 2
    assert all(s.strip() and not s.startswith("]") for s in pushed)
    assert sum("l_quantity" in s for s in pushed) == 1  # derived envelope
    assert sum("p_brand" in s for s in pushed) == 1     # part disjunction


def test_q6_aggregates_without_join_or_width(spark):
    """Pure scan-filter-agg: no join operators, scan reads <= 4 columns."""
    plan = _plan(spark, "tpch_q6")
    assert "Join" not in plan
    cols = set()
    for m_ in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        cols.update(c.split(":")[0].strip() for c in m_.split(",") if ":" in c)
    assert len(cols) <= 4


def test_topk_uses_take_ordered_not_global_sort(spark):
    """Top-k queries must plan TakeOrderedAndProject (per-partition
    heaps), never a global sort feeding a limit."""
    for name in ("tpch_q10", "tpch_q21"):
        plan = _plan(spark, name)
        assert "TakeOrderedAndProject" in plan, name


def test_embedding_dim_stats_partial_agg_before_shuffle(spark):
    """The 64x explode must be reduced by map-side partial aggregation
    before its single exchange."""
    plan = _plan(spark, "embedding_dim_stats")
    assert _shuffles(plan) == 1
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_fan_out_repartitions_single_file_scan(spark):
    """The shingle explode must not inherit a single-file scan's one
    partition: fan_out inserts a round-robin Exchange on narrow file
    scans (and ONLY there -- derived inputs are left to AQE)."""
    from pyspark.sql import functions as F

    from async_stream_processing_spark.llm.dedup import fan_out
    from async_stream_processing_spark.sources.parquet import load_table

    docs = load_table(spark, SF, "documents")
    plan = fan_out(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange RoundRobinPartitioning" in plan

    # derived input (already behind a shuffle): no extra exchange stacked
    derived = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    plan2 = fan_out(derived)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange RoundRobinPartitioning" not in plan2

    # wide-node detection matches node NAMES, not plan-string substrings:
    # an alias that merely contains "Join"/"Window" must not suppress the
    # repartition on a scan-only input
    aliased = docs.select(
        F.col("doc_id").alias("JoinKey"), F.col("text").alias("WindowText")
    )
    plan3 = fan_out(aliased)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange RoundRobinPartitioning" in plan3


def test_range_join_is_equi_not_nested_loop(spark):
    """The bucketized range join must plan as an EQUI join (hash/sort-
    merge/broadcast-hash on the bucket key), never the O(n*m) broadcast
    nested loop the raw theta predicate degrades to."""
    plan = _plan(spark, "range_join_bands")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_funnel_single_exchange(spark):
    """The whole 3-step funnel rides ONE user_id exchange: stacked window
    minima reuse the partitioning, and the final per-user aggregate is
    partial-aggregated on the same keys."""
    plan = _plan(spark, "funnel_steps")
    assert _shuffles(plan) == 1


def test_retention_two_exchanges(spark):
    """Retention = first-seen window (key exchange) + cell aggregate
    (cohort/offset exchange); anything more is a regression."""
    plan = _plan(spark, "retention_cohorts")
    assert _shuffles(plan) <= 2


def test_cube_single_exchange(spark):
    """CUBE expands grouping sets map-side: one exchange, partial + final
    hash aggregates."""
    plan = _plan(spark, "cube_orders")
    assert _shuffles(plan) == 1
    assert plan.count("HashAggregate") >= 2


def test_weighted_sample_zero_exchanges(spark):
    """Sequential Poisson top-k plans as TakeOrdered: per-partition
    heaps + driver merge, ZERO exchanges -- the weighted sample of an
    arbitrarily large corpus moves k rows."""
    plan = _plan(spark, "weighted_sample")
    assert _shuffles(plan) == 0
    assert "TakeOrderedAndProject" in plan


# Queries ALLOWED an unpartitioned (single-sort-partition) Window node,
# with the exact count and the reason each is acceptable at scale:
#   positional_zip       (2) fixture-fidelity global zip order (the
#                            reference's positional merge semantics);
#                            scale path = positional_index (zipWithIndex)
#   running_combine      (3) the reference's running agg over the TOTAL
#                            event order -- global-by-definition replay
#                            semantics (SURVEY §3.4); documented SCALE.md
#   spread_bid_ask       (2) same total-order replay family
#   equidepth_histogram  (1) exact NTILE twin; scale path =
#                            approx_equidepth_histogram (sketch, no sort)
#   weighted_sample      (1) rank window runs AFTER .limit(k): input is
#                            k rows (TakeOrderedAndProject), not corpus
#   quality_stratified_sample (1) NTILE strata over the doc-count-sized
#                            rarity aggregate; documented in docstring
#   cms_token_counts     (1) rank over the VOCABULARY-sized estimate
#                            table with rank <= k filter (window group
#                            limit pushdown bounds the sort)
#   bm25_topk            (1) rank window runs AFTER .limit(k) (the
#                            weighted_sample pattern): input is the k
#                            TakeOrderedAndProject survivors, not corpus
#   unimax_mixture       (3) integer waterfilling (rank/cumsum, the
#                            capped-prefix probe, i*/S* extraction) over
#                            the #sources-row aggregate -- O(10^2) rows
#                            by nature; the corpus itself is scanned once
#                            and only groupBy-shuffled
UNPARTITIONED_WINDOW_ALLOWLIST = {
    "bm25_topk": 1,
    "unimax_mixture": 3,
    "positional_zip": 2,
    "running_combine": 3,
    "spread_bid_ask": 2,
    "equidepth_histogram": 1,
    "weighted_sample": 1,
    "quality_stratified_sample": 1,
    "cms_token_counts": 1,
    # cumsum over the per-bucket AGGREGATE (O(corpus/bucket_docs) rows
    # of integers), never the corpus -- documented in vocab_growth
    "vocab_growth": 1,
    # quantile NTILE over (n_tokens, doc_id) -- fixture-scale shortcut;
    # at 100 TB bucket boundaries come from approx_percentile (no
    # global sort), documented in llm/curation.length_bucketed_packing.
    # (Added by the prior session post-suite; the audit caught it here.)
    "length_bucketed_packing": 1,
    # the centered trend RANGE frame orders the DAY-GRAIN aggregate --
    # one row per day, volume-invariant (a century is ~37k rows), never
    # the corpus; documented in analytics.seasonal_decompose_daily.
    # (4 = the analyzer's per-expression Window nodes over that frame.)
    "seasonal_decompose": 4,
}


def test_no_unpartitioned_windows_outside_allowlist(spark):
    """Every declared batch query's analyzed plan is audited for Window
    nodes with an EMPTY partition spec (a single-partition global sort at
    scale).  Only the documented allowlist may have them, at exactly the
    recorded counts -- a new global window anywhere else fails the suite."""
    import __spark_entry__ as m

    def unpartitioned_windows(df) -> int:
        def walk(node):
            yield node
            ch = node.children()
            for i in range(ch.size()):
                yield from walk(ch.apply(i))

        root = df._jdf.queryExecution().analyzed()
        return sum(
            1
            for n in walk(root)
            if n.getClass().getSimpleName() == "Window"
            and n.partitionSpec().isEmpty()
        )

    found: dict[str, int] = {}
    for name, fn in m.queries().items():
        if name.startswith("stream_"):
            continue  # micro-batch plans audited via their own tests
        n = unpartitioned_windows(fn(spark, SF))
        if n:
            found[name] = n
    assert found == UNPARTITIONED_WINDOW_ALLOWLIST


def test_table_stats_counts_nulls_and_ndv(spark):
    from async_stream_processing_spark.plans.stats import table_stats

    df = spark.createDataFrame(
        [(1, "aa"), (2, None), (2, "bbbb"), (None, "aa")],
        "k long, s string",
    )
    out = {r["column_name"]: r for r in table_stats(df).collect()}
    k, s = out["k"], out["s"]
    assert (k["n_rows"], k["n_nonnull"], k["ndv"]) == (4, 3, 2)
    assert (k["min_numeric"], k["max_numeric"]) == (1.0, 2.0)
    assert k["min_len"] is None and k["avg_len"] is None
    assert (s["n_rows"], s["n_nonnull"], s["ndv"]) == (4, 3, 2)
    assert (s["min_len"], s["max_len"]) == (2, 4)
    assert s["avg_len"] == (2 + 4 + 2) / 3
    assert s["min_numeric"] is None


def test_zorder_prunes_both_axes_linear_only_its_sort_key(spark):
    """The clustering claim itself: on a uniform 2-d grid, the Z-order
    layout skips most files for band predicates on EITHER axis, while
    the linear layout skips only on its own sort dimension."""
    import datetime

    from async_stream_processing_spark.plans.layout import (
        zorder_prune_stats,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    n = 0
    for ck in range(64):
        for day in range(64):
            rows.append(
                (n, ck, "O", 1.0, t0 + datetime.timedelta(days=day), "P")
            )
            n += 1
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = {(r["layout"], r["predicate"]): r
           for r in zorder_prune_stats(orders).collect()}
    lin_x = out[("linear_x", "x_band")]
    lin_y = out[("linear_x", "y_band")]
    z_x = out[("zorder", "x_band")]
    z_y = out[("zorder", "y_band")]
    # same rows match under every layout
    assert lin_x["rows_selected"] == z_x["rows_selected"] > 0
    assert lin_y["rows_selected"] == z_y["rows_selected"] > 0
    # linear prunes its sort key only
    assert lin_x["files_scanned"] * 2 <= lin_x["files_total"]
    assert lin_y["files_scanned"] == lin_y["files_total"]
    # z-order prunes BOTH axes
    assert z_x["files_scanned"] * 2 <= z_x["files_total"]
    assert z_y["files_scanned"] * 2 <= z_y["files_total"]


def test_hilbert_code_matches_reference_walk(spark):
    """Both engines' unrolled Hilbert chain must equal the canonical
    xy2d walk on the full 16x16 grid, and be a bijection onto 0..255."""
    import duckdb

    from async_stream_processing_spark.plans.layout import (
        hilbert_code_steps,
        sql_hilbert_steps,
    )

    def xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    bits, n = 4, 16
    exp = {(x, y): xy2d(n, x, y) for x in range(n) for y in range(n)}
    df = spark.createDataFrame(
        [(x, y, 0) for x in range(n) for y in range(n)], "x long, y long, m long"
    )
    got = {(r["x"], r["y"]): r["hd"]
           for r in hilbert_code_steps(df, bits).collect()}
    assert got == exp
    assert sorted(got.values()) == list(range(n * n))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE coded AS SELECT x, y, 0::BIGINT AS m FROM "
        "(SELECT unnest(range(16)) x), (SELECT unnest(range(16)) y)"
    )
    q = "WITH " + sql_hilbert_steps(bits) + f" SELECT x, y, hd FROM h{bits}"
    dd = {(int(r[0]), int(r[1])): int(r[2]) for r in con.execute(q).fetchall()}
    assert dd == exp
