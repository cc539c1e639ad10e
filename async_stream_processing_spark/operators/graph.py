"""Iterative graph algorithms as DataFrame plans.

Connected components (pointer-jumping, O(log d) rounds) lives in
``llm.dedup``; this module adds weighted PageRank -- the second iterative
family a 100 TB analytics engine needs (influence / centrality over
interaction graphs).

Determinism contract: ranks are INTEGERS.  Every quantity is a scaled
integer (``scale = 10^12``) and every update uses only integer multiply,
integer floor-division, and integer sums -- all exact and
order-independent, so the result is bit-identical across engines,
partitionings, and retries, and a fixed-iteration run can be UNROLLED
into a plain SQL CTE chain for the oracle (same trick as the k-means
oracle).  The float variant differs from this by < 1e-10 relative; the
integer contract is what makes it *verifiable*.

Scale shape: each iteration is ONE shuffle -- contributions are computed
edge-side (``rank * w // out_w``: a broadcast-free join of ranks onto
edges keyed by src) and summed by dst.  Edges are the big table; they are
hash-partitioned on ``src`` once and every iteration reuses that
partitioning for the rank join (co-partitioned, no edge re-shuffle).
Dangling mass is dropped (documented variant; redistribute by adding a
rank-sum broadcast if the random-surfer normalization matters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Weighted integer PageRank over ``edges(src, dst, w)``.

    Returns ``(node, rank_scaled, n_out)`` where ``rank_scaled`` is the
    PageRank times ``scale``, floored at every arithmetic step (exact
    integer semantics -- see module docstring).  Update rule per node v:

        rank'[v] = (1-d)*scale + d * sum_{(u,v,w)} (rank[u]*w) // out_w[u]

    with both damping products taken as ``(x*num)//den`` integer ops.
    """
    edges = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long"),
        F.col("w").cast("long"),
    ).repartition("src")
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    base = (scale * (damping_den - damping_num)) // damping_den
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank_scaled"))
    wedges = edges.join(out_w, "src")  # co-partitioned on src, built once
    for _ in range(n_iter):
        contrib = (
            wedges.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .select(
                F.col("dst").alias("node"),
                # integral division (SQL DIV), never float: quantities can
                # exceed 2^53 where double division silently loses ulps
                F.expr("(rank_scaled * w) div out_w").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                F.expr(
                    f"{base}L + (coalesce(in_sum, 0L) * {damping_num}) "
                    f"div {damping_den}"
                ).alias("rank_scaled"),
            )
        )
    return ranks.join(out_w.withColumnRenamed("src", "node"), "node", "left").select(
        "node", "rank_scaled", F.coalesce(F.col("out_w"), F.lit(0)).alias("n_out")
    )


def sql_pagerank(
    edges_cte: str,
    n_iter: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = PR_SCALE,
) -> str:
    """DuckDB twin: the fixed iteration count unrolled as a CTE chain.

    ``edges_cte`` must define a relation ``edges(src, dst, w)``.
    """
    base = (scale * (damping_den - damping_num)) // damping_den
    ctes = [
        edges_cte,
        "out_w AS (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w "
        "FROM edges GROUP BY src)",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges))",
        f"r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank_scaled FROM nodes)",
    ]
    for i in range(n_iter):
        prev, cur = f"r{i}", f"r{i + 1}"
        ctes.append(
            f"""c{i} AS (
                SELECT e.dst AS node,
                       CAST(SUM((r.rank_scaled * e.w) // o.out_w)
                            AS BIGINT) AS in_sum
                FROM edges e
                JOIN out_w o ON o.src = e.src
                JOIN {prev} r ON r.node = e.src
                GROUP BY e.dst)"""
        )
        ctes.append(
            f"""{cur} AS (
                SELECT n.node,
                       CAST({base} + (COALESCE(c.in_sum, 0) * {damping_num})
                            // {damping_den} AS BIGINT) AS rank_scaled
                FROM nodes n LEFT JOIN c{i} c ON c.node = n.node)"""
        )
    return f"""
        WITH {','.join(ctes)}
        SELECT r.node, r.rank_scaled,
               COALESCE(o.out_w, 0) AS n_out
        FROM r{n_iter} r LEFT JOIN out_w o ON o.src = r.node
    """
