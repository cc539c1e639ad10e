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
    # lineage truncation, same discipline as the CC operator: without it
    # each iteration's plan re-expands the edge derivation and the rank
    # recurrence, growing the static plan O(iter^2) (observed: 52
    # Exchange nodes at 3 iterations vs ~10 with checkpoints).  Weighted
    # edges + node set are materialized ONCE; ranks are checkpointed per
    # round so iteration i's plan starts from data, not from iteration
    # i-1's plan.  (localCheckpoint locally; set a checkpoint dir for
    # executor-loss-safe reliable checkpoints at scale.)
    wedges = edges.join(out_w, "src").localCheckpoint(eager=False)
    nodes = nodes.localCheckpoint(eager=False)
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank_scaled"))
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
            .localCheckpoint(eager=False)
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


def triangle_counts(edges: DataFrame, orient: str = "degree") -> DataFrame:
    """Per-node triangle participation counts over the undirected simple
    graph induced by ``edges(src, dst)``.

    Canonical orientation: each undirected edge is kept once pointing
    from its smaller to its larger endpoint under a TOTAL order, so
    every triangle is found EXACTLY once as the wedge (x,y)+(y,z)
    closed by (x,z) -- no /6 correction, no double-count.  The counts
    are orientation-independent (every total order finds the same
    triangles), which is why the id-ordered SQL oracle verifies the
    degree-ordered engine plan.

    ``orient`` picks the order -- the scale knob (Suri & Vassilvitskii's
    MR triangle counting):

    * ``"id"`` -- order by node id.  Wedge fan-out is bounded by
      oriented degree under id order; a power-law hub with a small id
      keeps its whole degree on the outgoing side (quadratic wedges at
      the hub).
    * ``"degree"`` (default) -- order by (degree, id).  Every edge
      points toward the HIGHER-degree endpoint, so each node's outgoing
      degree is O(sqrt(m)) and total wedge count is O(m^1.5) even on
      power-law graphs.  Costs one degree aggregation + one broadcast
      join before orientation; same two single-key equi-joins after.

    Returns ``(node, n_triangles)`` for nodes in >= 1 triangle.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    if orient == "degree":
        deg = (
            und.select(F.col("a").alias("node"))
            .unionByName(und.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        # degree attach: plain equi-joins -- AQE broadcasts the degree
        # relation when it is small; at graph scale it shuffles on the
        # node key like every other join here
        withdeg = (
            und.join(deg.select(F.col("node").alias("a"),
                                F.col("deg").alias("da")), "a")
            .join(deg.select(F.col("node").alias("b"),
                             F.col("deg").alias("db")), "b")
        )
        a_first = (F.col("da") < F.col("db")) | (
            (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
        )
        und = withdeg.select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("a"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("b"),
        )
    wedge = (
        und.alias("e1")
        .join(und.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(F.col("e1.a").alias("wa"), F.col("e1.b").alias("wb"),
                F.col("e2.b").alias("wc"))
    )
    tri = wedge.join(
        und.alias("e3"),
        (F.col("wa") == F.col("e3.a")) & (F.col("wc") == F.col("e3.b")),
    ).select("wa", "wb", "wc")
    return (
        tri.select(F.explode(F.array("wa", "wb", "wc")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def sql_triangle_counts(edges_cte: str) -> str:
    """DuckDB twin of :func:`triangle_counts` (same orientation)."""
    return f"""
        WITH {edges_cte},
        und AS (
            SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM edges WHERE src <> dst),
        tri AS (
            SELECT e1.a, e1.b, e2.b AS c
            FROM und e1
            JOIN und e2 ON e2.a = e1.b
            JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
        SELECT node, COUNT(*) AS n_triangles FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri)
        GROUP BY node
    """


def bfs_levels(
    edges: DataFrame, seeds: DataFrame, n_iter: int = 4
) -> DataFrame:
    """Multi-source BFS: hop distance from the nearest seed node, capped
    at ``n_iter`` hops (unreached nodes are absent from the output).

    ``edges(src, dst)`` is used as given (symmetrize before calling for
    undirected reach); ``seeds(node)`` are distance 0.  Each iteration
    relaxes one hop: ``dist'(v) = min(dist(v), min over edges(u,v) of
    dist(u)+1)`` — a join of the current frontier table onto edges keyed
    by ``src`` plus a min-groupBy, i.e. TWO shuffles per hop with the
    edge table hash-partitioned ONCE on ``src`` and reused (the same
    co-partitioned shape as :func:`pagerank`).  Distances are pure
    integers: bit-identical across engines/partitionings, so a fixed
    ``n_iter`` run unrolls into a CTE-chain oracle.

    A frontier optimization (only propagate nodes whose dist changed
    last round) is deliberately omitted: it saves work only on
    high-diameter graphs, and the full-relaxation form keeps every
    iteration's plan identical (codegen cache hits), which measured
    faster on the wide flat graphs this engine targets.
    """
    edges = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .distinct()
        .repartition("src")
        .localCheckpoint(eager=False)
    )
    dist = seeds.select(
        F.col("node").cast("long"), F.lit(0).cast("long").alias("dist")
    ).distinct()
    for _ in range(n_iter):
        cand = (
            edges.join(
                dist.withColumnRenamed("node", "src"), "src"
            ).select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.lit(1)).alias("dist"),
            )
        )
        dist = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
    return dist


def sql_bfs_levels(edges_cte: str, seeds_cte: str, n_iter: int = 4) -> str:
    """DuckDB twin of :func:`bfs_levels`: the fixed hop count unrolled as
    a CTE chain.  ``edges_cte`` must define ``edges(src, dst)`` and
    ``seeds_cte`` must define ``seeds(node)``."""
    ctes = [
        edges_cte,
        seeds_cte,
        "d0 AS (SELECT DISTINCT node, 0 AS dist FROM seeds)",
    ]
    for i in range(n_iter):
        ctes.append(
            f"""d{i + 1} AS (
                SELECT node, MIN(dist) AS dist FROM (
                    SELECT node, dist FROM d{i}
                    UNION ALL
                    SELECT DISTINCT e.dst AS node, d.dist + 1 AS dist
                    FROM edges e JOIN d{i} d ON d.node = e.src)
                GROUP BY node)"""
        )
    return f"""
        WITH {','.join(ctes)}
        SELECT node, CAST(dist AS BIGINT) AS dist FROM d{n_iter}
    """


def label_propagation(edges: DataFrame, n_iter: int = 3) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) with DETERMINISTIC ties: every node starts as its own
    label; each round it adopts the most frequent label among its
    in-neighbors over ``edges(src, dst)`` (symmetrize for undirected
    communities), ties broken by the smaller label.  Classic LPA breaks
    ties randomly; the min-label rule makes the fixed-round run pure
    integer arithmetic — bit-identical across engines and
    partitionings, so it unrolls into a CTE-chain oracle like
    :func:`bfs_levels`.

    Per round: one co-partitioned join of labels onto the (once-
    partitioned, checkpointed) edge table, a (dst, label) count, and a
    min-struct argmax per node — the same two-shuffle iterate-join
    shape as PageRank.  Nodes with no in-edges keep their label.
    """
    edges = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .distinct()
        .repartition("src")
        .localCheckpoint(eager=False)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(n_iter):
        counts = (
            edges.join(
                labels.withColumnRenamed("node", "src"), "src"
            )
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        # argmax by count, min label on ties: lexicographic min of
        # (-cnt, label) — the ROW_NUMBER(ORDER BY cnt DESC, label) pick
        majority = counts.groupBy("node").agg(
            F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("label")))
            .getField("label")
            .alias("new_label")
        )
        labels = (
            labels.join(majority, "node", "left")
            .select(
                "node",
                F.coalesce("new_label", "label").alias("label"),
            )
            .localCheckpoint(eager=False)
        )
    return labels


def sql_label_propagation(edges_cte: str, n_iter: int = 3) -> str:
    """DuckDB twin of :func:`label_propagation`: fixed rounds unrolled.
    ``edges_cte`` must define ``edges(src, dst)``."""
    ctes = [
        edges_cte,
        """e AS (SELECT DISTINCT src, dst FROM edges),
        l0 AS (SELECT node, node AS label FROM (
            SELECT src AS node FROM e UNION SELECT dst FROM e))""",
    ]
    for i in range(n_iter):
        ctes.append(
            f"""l{i + 1} AS (
                SELECT n.node, COALESCE(m.new_label, n.label) AS label
                FROM l{i} n LEFT JOIN (
                    SELECT node, label AS new_label FROM (
                        SELECT e.dst AS node, l.label,
                               ROW_NUMBER() OVER (
                                   PARTITION BY e.dst
                                   ORDER BY COUNT(*) DESC, l.label ASC
                               ) AS rn
                        FROM e JOIN l{i} l ON l.node = e.src
                        GROUP BY e.dst, l.label) t
                    WHERE rn = 1) m ON m.node = n.node)"""
        )
    return f"""
        WITH {','.join(ctes)}
        SELECT node, CAST(label AS BIGINT) AS label FROM l{n_iter}
    """


# Connected components (pointer-jumping min-label, O(log d) rounds) lives
# in llm.dedup where the near-dup pipeline composes it; re-exported here
# so graph users find the whole family in one place.
from ..llm.dedup import connected_components  # noqa: E402,F401


def kcore_peel(edges: DataFrame, k: int, n_rounds: int = 3) -> DataFrame:
    """Iterative k-core peeling: repeatedly drop nodes with degree < k
    from the undirected simple graph, ``n_rounds`` times, and return the
    surviving nodes with their induced degree.

    Peeling is monotone (removals only ever cascade), so a fixed-round
    run is a deterministic UPPER set of the true k-core that equals it
    once a round removes nothing — callers wanting the fixpoint loop
    until the survivor count is stable (one O(1) scalar per round, the
    same driver discipline as connected_components).  Each round is one
    degree aggregation + one semi-join per side: two shuffles, both on
    the node key.  Integer degrees -> bit-identical across engines, so
    a fixed ``n_rounds`` unrolls into a CTE-chain oracle.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    for _ in range(n_rounds):
        deg = (
            und.select(F.col("a").alias("node"))
            .unionByName(und.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node")
        und = (
            und.join(keep.withColumnRenamed("node", "a"), "a", "leftsemi")
            .join(keep.withColumnRenamed("node", "b"), "b", "leftsemi")
            .localCheckpoint(eager=False)
        )
    return (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") >= k)
    )


def sql_kcore_peel(edges_cte: str, k: int, n_rounds: int = 3) -> str:
    """DuckDB twin of :func:`kcore_peel` (same fixed-round unroll)."""
    ctes = [
        edges_cte,
        """e0 AS (SELECT DISTINCT LEAST(src, dst) AS a,
                         GREATEST(src, dst) AS b
                  FROM edges WHERE src <> dst)""",
    ]
    for i in range(n_rounds):
        ctes.append(
            f"""k{i} AS (
                SELECT node FROM (
                    SELECT node, COUNT(*) AS deg FROM (
                        SELECT a AS node FROM e{i}
                        UNION ALL SELECT b FROM e{i})
                    GROUP BY node)
                WHERE deg >= {k})"""
        )
        ctes.append(
            f"""e{i + 1} AS (
                SELECT e.a, e.b FROM e{i} e
                WHERE e.a IN (SELECT node FROM k{i})
                  AND e.b IN (SELECT node FROM k{i}))"""
        )
    return f"""
        WITH {','.join(ctes)}
        SELECT node, CAST(deg AS BIGINT) AS deg FROM (
            SELECT node, COUNT(*) AS deg FROM (
                SELECT a AS node FROM e{n_rounds}
                UNION ALL SELECT b FROM e{n_rounds})
            GROUP BY node)
        WHERE deg >= {k}
    """
