"""Tests for llm.linalg (Gram/covariance/PCA) and the Bloom-prefiltered
decontamination path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from async_stream_processing_spark.llm.linalg import (
    QUANT_SCALE,
    gram_exact,
    gram_partial_pandas,
    pca_components,
    pca_project,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def test_gram_exact_matches_numpy_integer_ground_truth(emb, emb_np):
    """The distributed explode+decimal path must equal a local integer
    computation bit-for-bit (same floor quantization)."""
    q = np.floor(emb_np * QUANT_SCALE).astype(np.int64)
    got = {
        (r["i"], r["j"]): (int(r["s_ij"]), int(r["s_i"]), int(r["s_j"]),
                           int(r["cov_scaled"]))
        for r in gram_exact(emb).collect()
    }
    n, d = q.shape
    assert len(got) == d * (d + 1) // 2
    s = q.sum(axis=0)
    # spot-check full first row + diagonal (object ints: no int64 overflow)
    for i in range(d):
        for j in (i, d - 1):
            if j < i:
                continue
            s_ij = int(np.dot(q[:, i].astype(object), q[:, j].astype(object)))
            exp = (s_ij, int(s[i]), int(s[j]),
                   n * s_ij - int(s[i]) * int(s[j]))
            assert got[(i, j)] == exp, (i, j)


def test_gram_partial_pandas_matches_dense(emb, emb_np):
    """The mapInPandas partial-Gram fold equals the single-machine dense
    product to float64 tolerance, for any partitioning."""
    gram, sums, n = gram_partial_pandas(emb.repartition(7))
    assert n == len(emb_np)
    np.testing.assert_allclose(gram, emb_np.T @ emb_np, rtol=1e-12)
    np.testing.assert_allclose(sums, emb_np.sum(axis=0), rtol=1e-12)


def test_pca_components_invariants(emb, emb_np):
    comps, var, mean = pca_components(emb, k=8)
    # orthonormal rows
    np.testing.assert_allclose(comps @ comps.T, np.eye(8), atol=1e-9)
    # variances sorted desc, non-negative, and match numpy's eigh on the
    # same covariance
    assert all(var[i] >= var[i + 1] - 1e-12 for i in range(len(var) - 1))
    assert (var >= -1e-9).all()
    centered = emb_np - emb_np.mean(axis=0)
    ref = np.linalg.eigvalsh(centered.T @ centered / len(emb_np))[::-1][:8]
    np.testing.assert_allclose(var, ref, rtol=1e-8)
    np.testing.assert_allclose(mean, emb_np.mean(axis=0), rtol=1e-12)


def test_pca_project_matches_numpy(emb, emb_np):
    model = pca_components(emb, k=4)
    comps, _, mean = model
    got = {
        r["vec_id"]: np.array(r["pca"])
        for r in pca_project(emb, k=4, model=model).collect()
    }
    ids = sorted(got)
    proj = np.stack([got[i] for i in ids])
    expect = (emb_np - mean) @ comps.T
    np.testing.assert_allclose(proj, expect, atol=1e-9)
    # Bessel: projection never exceeds the centered norm
    assert (
        (proj**2).sum(axis=1) <= ((emb_np - mean) ** 2).sum(axis=1) + 1e-9
    ).all()


def test_pca_projection_plan_has_no_shuffle(emb):
    model = pca_components(emb, k=4)
    plan = pca_project(emb, k=4, model=model)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.replace("BroadcastExchange", "BX"), plan


def test_bloom_no_false_negatives_and_prunes():
    from async_stream_processing_spark.llm.decontaminate import build_bloom

    rng = np.random.RandomState(7)
    members = rng.randint(0, 1 << 60, size=2000).astype(np.int64)
    others = rng.randint(0, 1 << 60, size=20000).astype(np.int64)
    m_bits, k = 1 << 16, 4
    packed = build_bloom(members, m_bits, k)
    bits = np.unpackbits(packed).astype(bool)

    def contains(h):
        h1 = h % m_bits
        h2 = ((h >> 29) | 1) % m_bits
        ok = np.ones(len(h), dtype=bool)
        for i in range(k):
            ok &= bits[(h1 + i * h2) % m_bits]
        return ok

    assert contains(members).all()  # no false negatives, ever
    fp = contains(others).mean()
    assert fp < 0.05, fp  # ~(1-e^(-kn/m))^k ~ 0.3% at this sizing


def test_bloom_decontaminate_equals_exact_path(spark):
    from async_stream_processing_spark.llm.decontaminate import (
        bloom_decontaminate,
        decontaminate,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    exact = {tuple(r) for r in decontaminate(docs, bench, n=8).collect()}
    pruned = {tuple(r) for r in bloom_decontaminate(docs, bench, n=8).collect()}
    assert exact == pruned
    assert exact  # non-vacuous: the bench docs collide with themselves


def test_token_rarity_small_example(spark):
    from async_stream_processing_spark.llm.text_analysis import token_rarity

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in token_rarity(docs).collect()}
    # freqs: a=2, b=2, c=1
    assert rows[1]["n_tokens"] == 3
    assert rows[1]["mean_tok_freq"] == pytest.approx(6 / 3)
    assert rows[1]["min_tok_freq"] == 2
    assert rows[2]["mean_tok_freq"] == pytest.approx(3 / 2)
    assert rows[2]["min_tok_freq"] == 1


def test_pagerank_hand_computed_chain(spark):
    """3-node chain a->b->c (+ c->a to avoid dangling-everything): verify
    the exact integer fixpoint by hand-running the same recurrence in
    Python integers."""
    from async_stream_processing_spark.operators.graph import (
        PR_SCALE,
        pagerank,
    )

    E = [(1, 2, 1), (2, 3, 1), (3, 1, 1)]
    edges = spark.createDataFrame(E, "src long, dst long, w long")
    got = {r["node"]: r["rank_scaled"] for r in pagerank(edges, n_iter=3).collect()}

    ranks = {n: PR_SCALE for n in (1, 2, 3)}
    out_w = {1: 1, 2: 1, 3: 1}
    base = (PR_SCALE * 15) // 100
    for _ in range(3):
        inc = {n: 0 for n in ranks}
        for s, d, w in E:
            inc[d] += (ranks[s] * w) // out_w[s]
        ranks = {n: base + (inc[n] * 85) // 100 for n in ranks}
    assert got == ranks
    # symmetric cycle: all equal
    assert len(set(got.values())) == 1


def test_pagerank_partitioning_invariant(spark):
    from async_stream_processing_spark.operators.graph import pagerank

    rng = np.random.RandomState(3)
    E = [
        (int(a), int(b), int(w))
        for a, b, w in zip(
            rng.randint(0, 40, 300), rng.randint(0, 40, 300),
            rng.randint(1, 5, 300),
        )
    ]
    e1 = spark.createDataFrame(E, "src long, dst long, w long").coalesce(1)
    e7 = spark.createDataFrame(E, "src long, dst long, w long").repartition(7)
    r1 = sorted(map(tuple, pagerank(e1, n_iter=3).collect()))
    r7 = sorted(map(tuple, pagerank(e7, n_iter=3).collect()))
    assert r1 == r7  # bit-identical under any partitioning (integer math)
    # higher in-weight nodes rank higher than isolated-ish ones on average
    assert len(r1) == len({t[0] for t in r1})


def test_tfidf_top_terms_small(spark):
    from async_stream_processing_spark.llm.text_analysis import tfidf_top_terms

    docs = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry")],
        "doc_id long, text string",
    )
    rows = tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: apple tf=2 df=1 -> 2*2/1=4 ; banana tf=1 df=2 -> 1
    d1 = sorted(by_doc[1], key=lambda r: r["rank"])
    assert [r["tok"] for r in d1] == ["apple", "banana"]
    assert d1[0]["tfidf"] == pytest.approx(4.0)
    # doc 2: cherry tf=1 df=1 -> 2 ; banana -> 1
    d2 = sorted(by_doc[2], key=lambda r: r["rank"])
    assert [r["tok"] for r in d2] == ["cherry", "banana"]


def test_triangle_counts_known_graphs(spark):
    from async_stream_processing_spark.operators.graph import triangle_counts

    # triangle 1-2-3 (given as directed/multi edges) + dangling edge 3-4
    E = [(1, 2), (2, 1), (2, 3), (3, 1), (3, 4)]
    edges = spark.createDataFrame(E, "src long, dst long")
    got = {tuple(r) for r in triangle_counts(edges).collect()}
    assert got == {(1, 1), (2, 1), (3, 1)}

    # K4: every node is in C(3,2)=3 triangles
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    got4 = {tuple(r) for r in triangle_counts(
        spark.createDataFrame(k4, "src long, dst long")).collect()}
    assert got4 == {(n, 3) for n in range(4)}


def test_triangle_degree_orientation_tames_hubs(spark):
    """On a power-law-ish graph (one hub with the SMALLEST id touching
    every node), id-orientation points all hub edges outward and
    enumerates O(deg^2) wedges at the hub; degree-orientation points
    them inward, collapsing the wedge count -- same final triangle
    counts (both verified against each other)."""
    from pyspark.sql import functions as F

    from async_stream_processing_spark.operators.graph import triangle_counts

    # a wedge is centered at y when y has neighbors BOTH below and above
    # it in the order; a mid-id hub under id order centers ~ (deg/2)^2
    # wedges, while degree order ranks the hub LAST (no neighbors above)
    n, hub_id = 200, 100
    hub = [(hub_id, i) for i in range(1, n) if i != hub_id]
    ring = [(i, i + 1) for i in range(1, n - 1)
            if i != hub_id and i + 1 != hub_id]
    edges = spark.createDataFrame(hub + ring, "src long, dst long")

    def wedge_count(orient):
        und = (
            edges.select(F.least("src", "dst").alias("a"),
                         F.greatest("src", "dst").alias("b"))
            .filter(F.col("a") != F.col("b")).distinct()
        )
        if orient == "degree":
            deg = (
                und.select(F.col("a").alias("node"))
                .unionByName(und.select(F.col("b").alias("node")))
                .groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
            )
            wd = (
                und.join(deg.select(F.col("node").alias("a"),
                                    F.col("deg").alias("da")), "a")
                .join(deg.select(F.col("node").alias("b"),
                                 F.col("deg").alias("db")), "b")
            )
            first = (F.col("da") < F.col("db")) | (
                (F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
            und = wd.select(
                F.when(first, F.col("a")).otherwise(F.col("b")).alias("a"),
                F.when(first, F.col("b")).otherwise(F.col("a")).alias("b"))
        return (
            und.alias("e1")
            .join(und.alias("e2"), F.col("e1.b") == F.col("e2.a"))
            .count()
        )

    w_id, w_deg = wedge_count("id"), wedge_count("degree")
    # ~(deg/2)^2 ~ 10^4 wedges at the mid-id hub under id order vs O(n)
    # under degree order
    assert w_id > 5000 and w_deg < 1000, (w_id, w_deg)
    # both orientations produce identical triangle counts
    t_id = sorted(map(tuple, triangle_counts(edges, orient="id").collect()))
    t_deg = sorted(map(tuple, triangle_counts(edges, orient="degree").collect()))
    assert t_id == t_deg and t_id  # non-vacuous


def test_rp_project_basis_vectors_recover_sign_matrix(spark):
    """Projecting standard basis vector e_i yields exactly column i of
    the ±1 sign matrix -- pins both the matrix derivation and the term
    order of the projection sums."""
    from async_stream_processing_spark.llm.linalg import rp_project, rp_signs

    d, k = 8, 4
    signs = rp_signs(k, d, seed=7)
    rows = []
    for i in range(d):
        v = [0.0] * d
        v[i] = 1.0
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in rp_project(emb, k=k, d=d, seed=7).collect()}
    for i in range(d):
        for j in range(k):
            assert out[i][f"rp_{j}"] == float(signs[j][i])


def test_rp_project_preserves_distances_approximately(spark):
    """JL sanity on a fixed seed: squared distances in the projected
    space (scaled by 1/k) stay within a generous multiplicative band of
    the originals -- the property that makes reduced-space ANN valid."""
    import random

    from async_stream_processing_spark.llm.linalg import rp_project

    rng = random.Random(3)
    d, k, n = 64, 16, 12
    vecs = [[rng.gauss(0, 1) for _ in range(d)] for _ in range(n)]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: [r[f"rp_{j}"] for j in range(k)]
           for r in rp_project(emb, k=k, d=d, seed=7).collect()}
    fl = {i: [float(__import__("numpy").float32(x)) for x in v]
          for i, v in enumerate(vecs)}
    ratios = []
    for a in range(n):
        for b in range(a + 1, n):
            orig = sum((fl[a][i] - fl[b][i]) ** 2 for i in range(d))
            proj = sum((out[a][j] - out[b][j]) ** 2 for j in range(k)) / k
            ratios.append(proj / orig)
    # k=16 gives a loose band; the seed is fixed so this is deterministic
    assert all(0.25 < r < 4.0 for r in ratios), (min(ratios), max(ratios))


def test_rp_project_literal_and_data_modes_bit_identical(spark):
    """The broadcast-data-row path (large k*d) and the literal-matrix
    path (small k*d) must produce BITWISE-equal projections: the data
    path's fold is seeded with the first product, so the addition order
    and every IEEE op match the literal expression exactly."""
    import random

    from async_stream_processing_spark.llm.linalg import rp_project

    rng = random.Random(11)
    d, k, n = 16, 6, 20
    emb = spark.createDataFrame(
        [(i, [float(rng.gauss(0, 1)) for _ in range(d)]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    lit = {r["vec_id"]: tuple(r[f"rp_{j}"] for j in range(k))
           for r in rp_project(emb, k=k, d=d, mode="literal").collect()}
    dat = {r["vec_id"]: tuple(r[f"rp_{j}"] for j in range(k))
           for r in rp_project(emb, k=k, d=d, mode="data").collect()}
    assert lit == dat and len(lit) == n
