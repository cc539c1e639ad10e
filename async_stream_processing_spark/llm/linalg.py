"""Distributed linear algebra over embedding columns: Gram/covariance
matrices and PCA projection.

Two shapes of the same computation, with an exactness bridge between them:

* :func:`gram_exact` -- the VERIFIABLE shape.  Embeddings are quantized to
  integers (``floor(x * 10^6)`` -- one double rounding, identical in every
  IEEE-754 engine), each row contributes its upper-triangle outer product
  as ``d*(d+1)/2`` (i, j, qi*qj) tuples, and a groupBy(i, j) sums them in
  ``DECIMAL(38,0)`` (exact, order-independent).  Map-side partial
  aggregation collapses the d^2/2 row amplification to ~2080 groups per
  partition before the shuffle, so the exchange moves O(partitions * d^2)
  rows regardless of N.  Centering uses the integer identity
  ``n*S_ij - S_i*S_j`` -- no float means, no cross-engine drift.  Bit-exact
  DuckDB twin (:func:`sql_gram_exact`).
* :func:`gram_partial_pandas` -- the 100 TB shape.  ``mapInPandas`` folds
  each Arrow batch into ONE d x d float64 partial Gram with a numpy
  ``E^T @ E`` (BLAS, no row amplification at all); partials are summed by
  a single-group aggregation.  Float summation order is not cross-engine
  portable, so this path is verified by PROPERTY instead of oracle: on the
  same data its integer-quantized twin matches :func:`gram_exact` exactly
  (``tests/test_llm_ops.py``).
* :func:`pca_project` -- covariance from the pandas partials -> driver-side
  ``numpy.linalg.eigh`` on the tiny d x d matrix (model state, like the
  k-means centroids) -> broadcast the top-k eigenvectors back as ONE data
  row -> projection is a narrow per-row fold (no join, no shuffle).

Reference parity: the reference engine has no linear algebra; this module
is part of the training-data-pipeline surface (brief: similarity search /
embedding analysis at scale).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 1_000_000


def quantize(arr, scale: int = QUANT_SCALE):
    """``array<float> -> array<bigint>`` via ``floor(x * scale)``.

    ``float32 -> double`` widening is exact; ``x * scale`` is one IEEE
    rounding; ``floor`` is exact -- every step is identical in Spark and
    DuckDB, so quantized values are bit-portable (unlike raw float sums).
    """
    c = F.col(arr) if isinstance(arr, str) else arr
    return F.transform(
        c, lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("long")
    )


def sql_quantize(expr: str, scale: int = QUANT_SCALE) -> str:
    return (
        f"list_transform({expr}, "
        f"x -> CAST(floor(CAST(x AS DOUBLE) * {scale}.0) AS BIGINT))"
    )


def gram_exact(embeddings: DataFrame, vec: str = "embedding") -> DataFrame:
    """Exact centered covariance (upper triangle, integer-quantized).

    Returns one row per dimension pair ``i <= j`` (0-based):
    ``(i, j, n, s_i, s_j, s_ij, cov_scaled)`` where ``s_ij = sum(qi*qj)``,
    ``s_i = sum(qi)`` and ``cov_scaled = n*s_ij - s_i*s_j`` -- the centered
    covariance times ``n^2 * scale^2``, exactly, as DECIMAL(38,0).

    Plan: one scan -> explode d(d+1)/2 products per row -> partial-agg
    (map-side combine shrinks to <=2080 groups/partition) -> one exchange
    of O(partitions * d^2) rows -> broadcast-join the tiny per-dimension
    sums.  The d^2 amplification never crosses the shuffle.
    """
    from .dedup import fan_out

    # the d^2/2 explode inherits the scan's partitioning -- a single-file
    # corpus would serialize it onto one core (same hazard as the shingle
    # pipeline; static probe, no-op at real scale)
    q = fan_out(embeddings).select(quantize(vec).alias("q"))
    # Upper-triangle outer product per row, built array-side so the explode
    # is a single generator (no self-join): for each i, pair q[i] with the
    # tail slice q[i..d).  Per-element products stay LONG (|q| <= ~scale,
    # so q_i*q_j <= scale^2 ~ 1e12 -- far under 2^63); only the cross-row
    # SUM widens to decimal, where overflow is actually possible at large
    # N.  Long multiply is codegen-cheap; decimal multiply is not.
    pairs = F.expr(
        "flatten(transform(q, (qi, i) -> "
        "  transform(slice(q, i + 1, size(q) - i), (qj, dj) -> "
        "    struct(i AS i, i + dj AS j, qi * qj AS p))))"
    )
    prods = (
        q.select(F.explode(pairs).alias("e"))
        .select("e.i", "e.j", "e.p")
        .groupBy("i", "j")
        .agg(
            F.sum(F.col("p").cast("decimal(38,0)")).alias("s_ij"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    dims = (
        q.select(F.posexplode("q").alias("i", "qi"))
        .groupBy("i")
        .agg(F.sum(F.col("qi").cast("decimal(38,0)")).alias("s"))
    )
    return (
        prods.join(F.broadcast(dims.select(F.col("i"), F.col("s").alias("s_i"))), "i")
        .join(F.broadcast(dims.select(F.col("i").alias("j"), F.col("s").alias("s_j"))), "j")
        .select(
            "i",
            "j",
            "n",
            "s_i",
            "s_j",
            "s_ij",
            (F.col("n") * F.col("s_ij") - F.col("s_i") * F.col("s_j")).alias(
                "cov_scaled"
            ),
        )
    )


def sql_gram_exact(src: str = "embeddings", vec: str = "embedding") -> str:
    """DuckDB twin of :func:`gram_exact` (1-based list indexing)."""
    return f"""
        WITH q AS (SELECT {sql_quantize(vec)} AS q FROM {src}),
        ix AS (SELECT unnest(range(1, (SELECT MAX(len(q)) FROM q) + 1)) AS i1),
        prods AS (
            SELECT gi.i1 - 1 AS i, gj.i1 - 1 AS j,
                   SUM(CAST(q.q[gi.i1] AS HUGEINT) * q.q[gj.i1]) AS s_ij,
                   COUNT(*) AS n
            FROM q, ix gi, ix gj
            WHERE gj.i1 >= gi.i1 AND gi.i1 <= len(q.q) AND gj.i1 <= len(q.q)
            GROUP BY 1, 2),
        dims AS (
            SELECT gi.i1 - 1 AS i, SUM(CAST(q.q[gi.i1] AS HUGEINT)) AS s
            FROM q, ix gi
            WHERE gi.i1 <= len(q.q)
            GROUP BY 1)
        SELECT CAST(p.i AS INTEGER) AS i, CAST(p.j AS INTEGER) AS j, p.n,
               CAST(di.s AS VARCHAR) AS s_i,
               CAST(dj.s AS VARCHAR) AS s_j,
               CAST(p.s_ij AS VARCHAR) AS s_ij,
               CAST(p.n * p.s_ij - di.s * dj.s AS VARCHAR) AS cov_scaled
        FROM prods p
        JOIN dims di ON di.i = p.i
        JOIN dims dj ON dj.i = p.j
    """


def gram_partial_pandas(
    embeddings: DataFrame, vec: str = "embedding", dim: int = 64
) -> np.ndarray:
    """d x d Gram matrix ``E^T E`` plus column sums, via per-batch numpy
    partials (the no-amplification scale path).

    Each Arrow batch becomes ONE row carrying a flattened float64 partial;
    a single final aggregation sums ~(#batches) rows.  Returns the pair
    ``(gram, col_sums, n)`` materialized driver-side -- O(d^2) model state,
    like k-means centroids.
    """
    d = dim

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = np.zeros((d, d), dtype=np.float64)
        sums = np.zeros(d, dtype=np.float64)
        n = 0
        for b in batches:
            if not len(b):
                continue
            m = np.array(
                [np.asarray(v, dtype=np.float64) for v in b[vec]], dtype=np.float64
            )
            gram += m.T @ m
            sums += m.sum(axis=0)
            n += len(m)
        if n:
            yield pd.DataFrame(
                {
                    "gram": [gram.ravel().tolist()],
                    "sums": [sums.tolist()],
                    "n": [n],
                }
            )

    partials = embeddings.select(vec).mapInPandas(
        fold, schema="gram array<double>, sums array<double>, n long"
    ).collect()
    gram = np.zeros((d, d))
    sums = np.zeros(d)
    n = 0
    for row in partials:
        gram += np.array(row["gram"]).reshape(d, d)
        sums += np.array(row["sums"])
        n += row["n"]
    return gram, sums, n


def pca_components(
    embeddings: DataFrame, vec: str = "embedding", dim: int = 64, k: int = 8
):
    """Top-k principal components from the pandas-partial covariance.

    The d x d eigenproblem is solved on the driver (``numpy.linalg.eigh``
    -- deterministic for a fixed matrix); sign is canonicalized so each
    component's largest-|coordinate| entry is positive.  Returns
    ``(components [k, d], explained_variance [k], mean [d])``.
    """
    gram, sums, n = gram_partial_pandas(embeddings, vec, dim)
    mean = sums / n
    cov = gram / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    # canonical sign: largest-|entry| coordinate positive
    for r in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[r])))
        if comps[r, j] < 0:
            comps[r] = -comps[r]
    return comps, vals[order], mean


def pca_project(
    embeddings: DataFrame,
    vec: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    k: int = 8,
    model=None,
) -> DataFrame:
    """Project each embedding onto the top-k PCs.

    The [k, d] component matrix is shipped as ONE broadcast data row
    (model state as data, not plan literals -- the k-means lesson in
    SCALE.md), and the projection is a narrow sequential fold per
    component: no join keys, no shuffle, codegen-stable across reruns.
    ``model`` accepts a precomputed :func:`pca_components` result so
    callers that need the mean/variances too only pay one Gram pass.
    """
    comps, _, mean = model if model is not None else pca_components(
        embeddings, vec, dim, k
    )
    spark = embeddings.sparkSession
    model = spark.createDataFrame(
        [(comps.tolist(), mean.tolist())], "comps array<array<double>>, mu array<double>"
    )
    centered = F.zip_with(
        F.transform(F.col(vec), lambda x: x.cast("double")),
        F.col("mu"),
        lambda x, m: x - m,
    )
    proj = F.transform(
        F.col("comps"),
        lambda c: F.aggregate(
            F.zip_with(centered, c, lambda x, w: x * w),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
    )
    return embeddings.join(F.broadcast(model)).select(
        id_col, proj.alias("pca")
    )


def fold_sum_first_seeded(arr):
    """Left fold of ``arr`` seeded with its FIRST element, referencing
    ``arr`` exactly once.

    The former ``aggregate(slice(arr, 2, d-1), element_at(arr, 1), +)``
    form references ``arr`` twice, and higher-order functions are
    evaluated interpreted (no codegen subexpression elimination), so the
    whole product array was computed TWICE per output dim (guide #1.2:
    per-task work).  ``coalesce(acc + x, x)`` seeds on the first element
    (NULL acc + x -> NULL -> coalesce picks x) and then accumulates --
    the identical left-associated IEEE sequence x1, x1+x2, ... with one
    ``arr`` reference.  NaN-safe: a NaN acc is not NULL, so coalesce
    keeps propagating it exactly as ``+`` would."""
    return F.aggregate(
        arr,
        F.lit(None).cast("double"),
        lambda acc, x: F.coalesce(acc + x, x),
    )


def rp_signs(k: int, d: int, seed: int = 7) -> list[list[int]]:
    """Deterministic ±1 projection matrix (k x d), the database-friendly
    Johnson-Lindenstrauss variant (Achlioptas 2003): entries are unit
    signs drawn from a seeded PRNG -- O(k*d) Python-side constants, the
    ``minhash_coeffs`` convention, so Spark and the oracle share the
    exact same matrix by construction."""
    import random

    rng = random.Random(seed)
    return [[rng.choice((-1, 1)) for _ in range(d)] for _ in range(k)]


def rp_project(
    embeddings: DataFrame,
    k: int = 16,
    d: int = 64,
    seed: int = 7,
    vec: str = "embedding",
    mode: str = "auto",
) -> DataFrame:
    """Random-projection dimensionality reduction: ``d`` floats -> ``k``
    doubles per vector via a ±1 sign matrix (JL lemma: pairwise
    distances are preserved within 1±eps for k = O(log n / eps^2)).
    The cheap front half of any 100 TB embedding pipeline -- project
    once, then run ANN / dedup / clustering in the reduced space.

    Two plan shapes, both NARROW one-pass maps (no shuffle, no Python),
    both producing bit-identical values:

    - ``literal`` (small k*d): the sign matrix compiles into k explicit
      left-associated ±x_i sum expressions.  Fastest per row, but plan
      size and codegen time grow with k*d.
    - ``data`` (default at k*d >= 1024): the sign matrix ships as ONE
      broadcast data row ("model state as data, not plan literals" --
      the ``pca_project`` convention) and each output dim is a
      zip_with-multiply + left fold SEEDED WITH THE FIRST PRODUCT, so
      the addition order and every IEEE op match the literal expression
      exactly (x * ±1.0 is an exact sign flip; no spurious ``0.0 +``
      head term).  Plan size is O(k), independent of d.

    ``mode='auto'`` picks by k*d; both paths share one oracle because
    the values are bitwise equal.

    Output: ``(vec_id, rp_0 .. rp_{k-1})``.
    """
    import operator
    from functools import reduce

    if mode == "auto":
        mode = "data" if k * d >= 1024 else "literal"
    signs = rp_signs(k, d, seed)
    emb = F.col(vec) if isinstance(vec, str) else vec
    if mode == "literal":
        cols = [F.col("vec_id")]
        for j in range(k):
            terms = []
            for i, s in enumerate(signs[j]):
                x = F.element_at(emb, i + 1).cast("double")
                terms.append(x if s > 0 else -x)
            cols.append(reduce(operator.add, terms).alias(f"rp_{j}"))
        return embeddings.select(*cols)
    spark = embeddings.sparkSession
    model = spark.createDataFrame(
        [([[float(s) for s in row] for row in signs],)],
        "rp_signs array<array<double>>",
    )
    embd = F.transform(emb, lambda x: x.cast("double"))
    cols = [F.col("vec_id")]
    for j in range(k):
        prods = F.zip_with(
            embd,
            F.element_at(F.col("rp_signs"), j + 1),
            lambda x, s: x * s,
        )
        # single-reference first-seeded fold: same IEEE sequence as the
        # slice/element_at form but the product array is built once per
        # output dim instead of twice (interpreted HOFs do no CSE)
        cols.append(fold_sum_first_seeded(prods).alias(f"rp_{j}"))
    return embeddings.join(F.broadcast(model)).select(*cols)


def sql_rp_project(
    k: int = 16,
    d: int = 64,
    seed: int = 7,
    src: str = "embeddings",
    vec: str = "embedding",
) -> str:
    """DuckDB twin of :func:`rp_project` (same literal sign matrix,
    same left-associated term order)."""
    signs = rp_signs(k, d, seed)
    outs = []
    for j in range(k):
        terms = [
            ("" if s > 0 else "-") + f"CAST({vec}[{i + 1}] AS DOUBLE)"
            for i, s in enumerate(signs[j])
        ]
        outs.append("(" + " + ".join(terms) + f") AS rp_{j}")
    sel = ",\n               ".join(outs)
    return f"""
        SELECT vec_id,
               {sel}
        FROM {src}
    """
