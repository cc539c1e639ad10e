"""Similarity search over embedding columns (``array<float>``).

* :func:`cosine` -- exact cosine via a **sequential left fold** in double
  precision (``aggregate``/``zip_with``).  The fold order is part of the
  contract: DuckDB's ``list_reduce`` folds left too, so oracle results are
  bit-identical.  (The decimal-sum trick from ``functions.numeric`` does
  NOT apply to float inputs -- their doubles carry ~17 significant digits
  and Spark/DuckDB round double->decimal differently there.)
* :func:`knn_bruteforce` -- baseline top-k: broadcast the (small) query
  set against the corpus, one dot product per (query, candidate), window
  rank.  Linear scan; the right answer up to ~10^7 x 10^3 work units.
* :func:`lsh_buckets` / :func:`knn_lsh` -- the scale path: random-
  hyperplane LSH (Charikar 2002).  Hyperplane weights are deterministic
  integers ``((131*j + 137*d) % 19) - 9`` so the oracle can re-derive them;
  candidates are restricted to bucket-mates, turning O(N*Q) into
  O(N*Q / 2^planes) with recall tunable by ``n_planes`` / multi-probe.
  At 100 TB: bucket the corpus once (write bucketed parquet), then each
  query batch joins on ``bucket`` -- a co-partitioned join, no broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def _fold_sum(arr: Column) -> Column:
    """Sequential left fold -- bit-equal to DuckDB list_reduce."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y))


def norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(_as_double(a), lambda x: x * x)))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"
    )


def sql_norm(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_transform({a}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))"
    )


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / ({sql_norm(a)} * {sql_norm(b)}))"


def knn_bruteforce(
    embeddings: DataFrame, n_queries: int = 10, k: int = 5
) -> DataFrame:
    """Exact top-k neighbors (cosine) for the first ``n_queries`` vectors.

    The query side is broadcast (it is small by construction); the corpus
    streams through one stage -- no shuffle of the corpus itself.
    """
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("q_emb"), F.col("c_emb")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), F.col("cos").alias("cosine"))
    )


def _plane_weight(j: int, idx0: Column) -> Column:
    """Deterministic integer hyperplane weight for plane j, 0-based dim."""
    return ((F.lit(131 * j) + F.lit(137) * idx0) % 19 - F.lit(9)).cast("double")


def lsh_buckets(embeddings: DataFrame, n_planes: int = 6) -> DataFrame:
    """Random-hyperplane bucket id per vector (sign-bit concatenation)."""
    emb = _as_double(F.col("embedding"))
    bucket = F.lit(0).cast("long")

    def weigh(j):
        # closure (not a default arg) -- pyspark counts lambda params to
        # pick the higher-order-function arity.
        return lambda x, i: x * _plane_weight(j, i)

    for j in range(n_planes):
        dot_j = F.aggregate(
            F.transform(emb, weigh(j)), F.lit(0.0), lambda acc, x: acc + x
        )
        bucket = bucket + F.shiftleft((dot_j >= 0).cast("long"), j)
    return embeddings.select("vec_id", "label", bucket.alias("bucket"))


def sql_lsh_bucket(emb: str, n_planes: int = 6) -> str:
    """DuckDB twin of the bucket id (lambda index is 1-based -> d = i-1)."""
    terms = []
    for j in range(n_planes):
        fold = (
            f"list_reduce(list_transform({emb}, (x, i) -> "
            f"CAST(x AS DOUBLE) * CAST((({131 * j} + 137 * (i - 1)) % 19) - 9 AS DOUBLE)), "
            f"(a, b) -> a + b)"
        )
        terms.append(f"(CASE WHEN {fold} >= 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def knn_lsh(
    embeddings: DataFrame, n_queries: int = 10, k: int = 3, n_planes: int = 6
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket."""
    b = lsh_buckets(embeddings, n_planes)
    withb = embeddings.join(b.select("vec_id", "bucket"), "vec_id")
    q = withb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket"),
    )
    c = withb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("bucket"),
    )
    scored = (
        c.join(q, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("q_emb"), F.col("c_emb")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), F.col("cos").alias("cosine"))
    )


def _seed_centroids(embeddings: DataFrame, n_centroids: int) -> DataFrame:
    """Deterministic init: the first ``n_centroids`` vectors by id."""
    return embeddings.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
    )


def _assign_to(embeddings: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, centroid_id, centroid_cosine, embedding): max-cosine cell
    per vector against the BROADCAST centroid set -- one corpus scan, no
    corpus shuffle."""
    scored = embeddings.join(F.broadcast(cents)).withColumn(
        "cos", cosine(F.col("embedding"), F.col("c_emb"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("centroid_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "vec_id", "centroid_id", F.col("cos").alias("centroid_cosine"),
            "embedding",
        )
    )


def kmeans_train(
    embeddings: DataFrame, n_centroids: int = 8, n_iter: int = 4
) -> DataFrame:
    """Spherical k-means (Lloyd) entirely in DataFrame ops: the trained
    replacement for the first-k centroid stand-in.

    Per iteration: (1) assign -- broadcast-join argmax-cosine, one corpus
    scan, the corpus never shuffles on anything but (centroid, dim)
    partial sums; (2) update -- elementwise mean via ``posexplode`` +
    map-side-combined avg per (centroid, dim), reassembled in dim order
    and L2-normalized (spherical k-means: centroids live on the unit
    sphere, so argmax cosine == argmin angular distance).  A cell that
    loses all members keeps its previous centroid.  Iterations are an
    iterative fixpoint -- the canonical rows-only op (oracle SQL would
    need the loop unrolled); recall improvement over the untrained
    stand-in is pinned by test instead."""
    cents = _seed_centroids(embeddings, n_centroids).localCheckpoint(eager=True)
    for _ in range(n_iter):
        assigned = _assign_to(embeddings, cents)
        dims = assigned.select(
            "centroid_id", F.posexplode(_as_double(F.col("embedding"))).alias("pos", "v")
        )
        # decimal-space mean: double summation is partition-order
        # dependent; decimal addition is associative, so the mean (and
        # therefore every trained centroid bit) is partitioning- and
        # retry-independent -- the repo's determinism contract
        means = dims.groupBy("centroid_id", "pos").agg(
            F.avg(F.col("v").cast("decimal(27,18)")).cast("double").alias("v")
        )
        new = (
            means.groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv"))
            .select(
                "centroid_id",
                F.transform(F.col("pv"), lambda s: s["v"]).alias("m"),
            )
            .withColumn(
                "c_emb",
                F.transform(
                    F.col("m"), lambda x: (x / norm(F.col("m"))).cast("float")
                ),
            )
            .select("centroid_id", "c_emb")
        )
        # empty cells keep their previous centroid
        cents = (
            cents.select("centroid_id", F.col("c_emb").alias("prev"))
            .join(new, "centroid_id", "left")
            .select("centroid_id", F.coalesce("c_emb", "prev").alias("c_emb"))
            .localCheckpoint(eager=True)
        )
    return cents


def ivf_assign(
    embeddings: DataFrame,
    n_centroids: int = 8,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-flat cell assignment.  Default centroids are the first
    ``n_centroids`` vectors (deterministic, oracle-portable); pass
    ``centroids=kmeans_train(...)`` for trained cells.  Each vector joins
    the broadcast centroid set and keeps its max-cosine cell.  One scan
    of the corpus; at 100 TB, write the corpus bucketed by
    ``centroid_id`` so query probes are partition-pruned reads."""
    cents = centroids if centroids is not None \
        else _seed_centroids(embeddings, n_centroids)
    return _assign_to(embeddings, cents).select(
        "vec_id", "centroid_id", "centroid_cosine"
    )


def knn_ivf(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 3,
    n_centroids: int = 8,
    nprobe: int = 2,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: each query probes its ``nprobe`` nearest
    cells and ranks only vectors assigned there -- the classic
    recall/cost dial (nprobe=n_centroids degenerates to brute force).
    Pass ``centroids=kmeans_train(...)`` for trained cells."""
    assign = ivf_assign(embeddings, n_centroids, centroids=centroids)
    cents = centroids if centroids is not None else \
        _seed_centroids(embeddings, n_centroids)
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    probe_scored = q.join(F.broadcast(cents)).withColumn(
        "cos", cosine(F.col("q_emb"), F.col("c_emb"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("centroid_id"))
    probes = (
        probe_scored.withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= nprobe)
        .select("query_id", "q_emb", "centroid_id")
    )
    cands = (
        assign.join(embeddings, "vec_id")
        .select("vec_id", "embedding", "centroid_id")
        .join(F.broadcast(probes), "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("q_emb"), F.col("embedding")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            F.col("rank").cast("long").alias("rank"), F.col("cos").alias("cosine"),
        )
    )


def knn_lsh_multiprobe(
    embeddings: DataFrame, n_queries: int = 10, k: int = 3, n_planes: int = 6
) -> DataFrame:
    """Multi-probe hyperplane LSH: each query probes its own bucket PLUS
    every bucket at Hamming distance 1 (one sign bit flipped) -- the
    standard recall fix for sign-LSH on weakly clustered data (measured
    here: single-probe recalls 1/30 of true top-3 on random embeddings;
    multi-probe at distance 1 covers the near-hyperplane misses).
    Candidate volume grows (n_planes+1)x, still nothing like all-pairs."""
    b = lsh_buckets(embeddings, n_planes)
    withb = embeddings.join(b.select("vec_id", "bucket"), "vec_id")
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)],
    )
    q = (
        withb.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.explode(probes).alias("bucket"),
        )
    )
    c = withb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("bucket"),
    )
    scored = (
        c.join(q, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "q_emb", "c_emb")
        .distinct()
        .withColumn("cos", cosine(F.col("q_emb"), F.col("c_emb")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.col("rank").cast("long").alias("rank"), F.col("cos").alias("cosine"),
        )
    )
