"""Semantic tests for the LLM-pipeline operators on hand-built fixtures
(the oracle harness covers the driver tables; these pin the *semantics*)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from async_stream_processing_spark.llm.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    simhash,
)
from async_stream_processing_spark.llm.multimodal import (
    decode_image_meta,
    decode_image_real,
    with_binary_payload,
)
from async_stream_processing_spark.llm.similarity import knn_bruteforce, lsh_buckets
from async_stream_processing_spark.llm.text_analysis import lang_id, text_stats


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_exact_dedup_counts_copies(spark):
    df = _docs(spark, ["a b c", "a b c", "  A B C ", "x y z"])
    out = {r["canonical_doc_id"]: r["n_copies"] for r in exact_dedup(df).collect()}
    # normalization folds case/whitespace: docs 0,1,2 collapse
    assert out == {0: 3, 3: 1}


def test_minhash_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    near = base.replace("lazy", "sleepy")
    other = "completely different words everywhere nothing shared at all " * 3
    df = _docs(spark, [base, near, other])
    pairs = minhash_dedup_pairs(df, threshold=0.3).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in pairs] == [(0, 1)]
    assert 0.3 <= pairs[0]["jaccard"] < 1.0


def test_minhash_identical_docs_sign_equal(spark):
    df = _docs(spark, ["one two three four five", "one two three four five"])
    sigs = minhash_signatures(df).collect()
    s0 = [sigs[0][f"mh_{j}"] for j in range(16)]
    s1 = [sigs[1][f"mh_{j}"] for j in range(16)]
    assert s0 == s1
    cands = lsh_candidate_pairs(minhash_signatures(df)).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in cands] == [(0, 1)]


def test_simhash_similar_docs_close(spark):
    df = _docs(spark, [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",   # 1 token differs
        "qqq www eee rrr ttt yyy uuu iii",                # disjoint
    ])
    out = {r["doc_id"]: r["simhash"] for r in simhash(df, bits=32).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(out[0], out[1]) < ham(out[0], out[2])


def test_knn_bruteforce_orders_by_cosine(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),   # closest to 0
        (2, [0.0, 1.0, 0.0], 1),
        (3, [-1.0, 0.0, 0.0], 1),  # antipode
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = knn_bruteforce(df, n_queries=1, k=3).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in out] == [1, 2, 3]
    assert out[0]["cosine"] == pytest.approx(0.9938, abs=1e-3)


def test_lsh_buckets_deterministic_and_sign_based(spark):
    rows = [
        (0, [1.0] * 8, 0),
        (1, [1.0] * 8, 0),      # identical -> same bucket
        (2, [-1.0] * 8, 1),     # negated -> complementary bucket
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["vec_id"]: r["bucket"] for r in lsh_buckets(df, n_planes=4).collect()}
    assert out[0] == out[1]
    assert out[0] != out[2]


def test_text_stats_basic(spark):
    df = _docs(spark, ["aa bb aa"])
    r = text_stats(df).collect()[0]
    assert (r["n_words"], r["n_unique_words"]) == (3, 2)
    assert r["avg_word_len"] == 2.0
    assert r["type_token_ratio"] == pytest.approx(2 / 3)


def test_lang_id_votes_stopwords(spark):
    df = _docs(spark, [
        "the cat and the dog in a house",       # en
        "der hund und die katze ist nicht da",  # de
        "zz yy xx ww",                          # no hits -> und
    ])
    out = {r["doc_id"]: r["lang_pred"] for r in lang_id(df).collect()}
    assert out == {0: "en", 1: "de", 2: "und"}


def test_multimodal_stub_plumbing(spark):
    df = with_binary_payload(_docs(spark, ["hello world", "abc"]))
    assert dict(df.dtypes)["payload"] == "binary"
    out = {r["doc_id"]: r for r in decode_image_meta(df).collect()}
    assert out[0]["n_bytes"] == 11
    assert out[0]["width"] == (ord("h") % 64 + 1) * 10
    assert out[1]["format"] == "png"  # 3 bytes % 3 == 0
    with pytest.raises(NotImplementedError):
        decode_image_real(df)


def test_stop_shingle_filter_preserves_near_dup_detection(spark):
    """Boilerplate shingles shared by every doc are dropped; planted
    near-dups still pair on their rare shingles."""
    from async_stream_processing_spark.llm.dedup import (
        doc_shingle_hashes,
        jaccard_pairs_direct,
    )

    boiler = "standard header boilerplate text appears everywhere always "
    docs = _docs(spark, [
        boiler + "unique alpha beta gamma delta epsilon zeta eta " * 2,
        boiler + "unique alpha beta gamma delta epsilon zeta iota " * 2,
        boiler + "totally different payload nothing shared here at all",
        boiler + "another unrelated body of words for the corpus fine",
    ])
    sh_all = doc_shingle_hashes(docs)
    sh_filt = doc_shingle_hashes(docs, max_doc_ratio=0.9)
    assert sh_filt.count() < sh_all.count()  # boilerplate shingles dropped
    pairs = jaccard_pairs_direct(sh_filt, threshold=0.3).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in pairs] == [(0, 1)]


def test_ivf_recall_on_clustered_vectors(spark):
    """IVF probing on data with real cluster structure (the driver's random
    embeddings have none -- STATUS/SCALE note): plant 8 tight clusters,
    check recall@3 of knn_ivf vs knn_bruteforce.  Deterministic synthetic
    input (fixed seed), so this is a hard bound, not flaky."""
    import random
    from async_stream_processing_spark.llm.similarity import knn_bruteforce, knn_ivf

    rng = random.Random(7)
    dim, n_clusters, per_cluster = 16, 8, 25
    centers = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n_clusters)]
    rows = []
    vid = 0
    # vec_ids 0..7 are the cluster centers themselves: they double as the
    # deterministic IVF centroids (ivf_assign uses the first n vectors)
    for c in centers:
        rows.append((vid, f"c{vid}", [float(x) for x in c])); vid += 1
    for ci, c in enumerate(centers):
        for _ in range(per_cluster):
            rows.append((vid, f"m{ci}",
                         [float(x + rng.gauss(0, 0.05)) for x in c])); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<float>")

    exact = {}
    for r in knn_bruteforce(df, n_queries=8, k=3).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx = {}
    for r in knn_ivf(df, n_queries=8, k=3, n_centroids=8, nprobe=2).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.9, f"recall {hits}/{total}"
