"""Data-selection importance features (DSIR-style) for corpus curation.

Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" (DSIR), selects pretraining documents by an importance weight
computed over HASHED N-GRAM features: unigrams+bigrams hashed into a
small fixed bucket space, with per-bucket probabilities estimated on a
target corpus (the domain you want) and the raw corpus (what you have).

This module implements the Spark-native front-end exactly and the scoring
stage as an engine-exact integer contrast:

* :func:`hashed_ngram_features` — the DSIR feature map: every unigram and
  bigram of a document hashed into ``n_buckets`` buckets (md5-based
  ``stable_hash60 % B``, the repo's portable hash), emitted as sparse
  ``(doc_id, bucket, count)`` rows.  ONE explode + ONE shuffle on
  ``(doc_id, bucket)``; output is bounded by ``n_buckets`` rows per doc.
* :func:`dsir_score` — per-document importance CONTRAST against a target
  subcorpus.  The paper's weight is ``sum_b c_b * log(p_t(b)/p_r(b))``;
  ``log`` is not bit-portable across engines (Java ``Math.log`` vs
  DuckDB's libm differ in final ulps), so the engine-exact form used for
  the *decision* is the linear contrast

      score = sum_b  c_b * (t_b * N_raw - r_b * N_target)

  (positive where the doc leans toward target-heavy buckets) with every
  term a BIGINT — same sign structure as the log-ratio at small
  divergences, cross-multiplied like every other decision rule in this
  engine (functions/numeric.py).  A double ``log``-based weight belongs
  in a report, not a keep/drop gate that must replay identically.

Scale shape: bucket statistics are ``n_buckets`` rows — MODEL STATE, like
k-means centroids — broadcast back over the corpus; the corpus itself
shuffles once on ``(doc_id, bucket)`` to build features and never again.

Reference parity note: the reference engine (asyncio event loop,
/root/reference/src/async_stream_processing/processor.py) has no corpus
operators; this module is part of the LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import sql_stable_hash60, stable_hash60
from ..functions.text import shingles, sql_shingles, sql_tokens, tokens

#: Default DSIR bucket count.  The paper uses 10k; 128 keeps the fixture's
#: per-bucket counts dense enough to exercise the contrast.  Model state is
#: O(n_buckets) either way.
DSIR_BUCKETS = 128


def _grams(text: str = "text") -> F.Column:
    """Unigrams + bigrams of the whitespace tokenization, one array."""
    return F.concat(tokens(text), shingles(text, 2))


def _sql_grams(words_expr: str) -> str:
    return f"list_concat({words_expr}, {sql_shingles(words_expr, 2)})"


def hashed_ngram_features(
    docs: DataFrame, n_buckets: int = DSIR_BUCKETS, text: str = "text"
) -> DataFrame:
    """DSIR hashed n-gram feature map: sparse per-doc bucket counts.

    Returns ``(doc_id, bucket, count, n_grams)`` where ``bucket`` is
    ``stable_hash60(gram) % n_buckets``, ``count`` the number of the
    doc's unigrams+bigrams landing there, and ``n_grams`` the doc's
    total gram count (the L1 norm, repeated per row for downstream
    normalization without a second join).
    """
    g = docs.select(
        "doc_id", F.explode(_grams(text)).alias("g")
    ).withColumn("bucket", stable_hash60(F.col("g")) % n_buckets)
    per = g.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("count")
    )
    totals = per.groupBy("doc_id").agg(F.sum("count").alias("n_grams"))
    return per.join(totals, "doc_id").select(
        "doc_id", "bucket", "count", "n_grams"
    )


def sql_hashed_ngram_features(
    src: str = "documents", n_buckets: int = DSIR_BUCKETS
) -> str:
    h = sql_stable_hash60("g")
    return f"""
        WITH words AS (SELECT doc_id, {sql_tokens('text')} AS w FROM {src}),
        grams AS (SELECT doc_id, unnest({_sql_grams('w')}) AS g FROM words),
        per AS (SELECT doc_id, ({h}) % {n_buckets} AS bucket,
                       COUNT(*) AS "count"
                FROM grams GROUP BY doc_id, bucket),
        totals AS (SELECT doc_id, SUM("count") AS n_grams
                   FROM per GROUP BY doc_id)
        SELECT p.doc_id, CAST(p.bucket AS BIGINT) AS bucket,
               CAST(p."count" AS BIGINT) AS "count",
               CAST(t.n_grams AS BIGINT) AS n_grams
        FROM per p JOIN totals t ON t.doc_id = p.doc_id
    """


def dsir_score(
    docs: DataFrame,
    target_source: str = "src0",
    n_buckets: int = DSIR_BUCKETS,
    text: str = "text",
    source: str = "source",
) -> DataFrame:
    """Per-document importance contrast toward a target subcorpus.

    ``target`` = rows whose ``source`` equals ``target_source`` (in a
    real pipeline: a high-quality seed corpus); ``raw`` = all rows.
    Bucket statistics ``t_b`` (target) and ``r_b`` (raw) are
    ``n_buckets``-row aggregates broadcast back over the per-doc
    features; the integer score (see module docstring) is exact and
    sign-stable across engines.  Returns ``(doc_id, n_grams,
    score_scaled)`` sorted-free; positive ``score_scaled`` means the
    doc's gram mass sits in buckets over-represented in the target.
    """
    feats = hashed_ngram_features(docs, n_buckets, text)
    tgt = (
        docs.filter(F.col(source) == target_source)
        .select("doc_id")
        .join(feats, "doc_id")
        .groupBy("bucket")
        .agg(F.sum("count").alias("t_b"))
    )
    raw = feats.groupBy("bucket").agg(F.sum("count").alias("r_b"))
    n_t = tgt.agg(F.sum("t_b").alias("n_target"))
    n_r = raw.agg(F.sum("r_b").alias("n_raw"))
    stats = (
        raw.join(tgt, "bucket", "left")
        .na.fill({"t_b": 0})
        .crossJoin(F.broadcast(n_t))
        .crossJoin(F.broadcast(n_r))
    )
    contrib = feats.join(F.broadcast(stats), "bucket").select(
        "doc_id",
        "n_grams",
        (
            F.col("count")
            * (
                F.col("t_b") * F.col("n_raw")
                - F.col("r_b") * F.col("n_target")
            )
        ).alias("c"),
    )
    return contrib.groupBy("doc_id").agg(
        F.max("n_grams").alias("n_grams"),
        F.sum("c").alias("score_scaled"),
    )


def sql_dsir_score(
    src: str = "documents",
    target_source: str = "src0",
    n_buckets: int = DSIR_BUCKETS,
) -> str:
    h = sql_stable_hash60("g")
    return f"""
        WITH words AS (SELECT doc_id, source, {sql_tokens('text')} AS w
                       FROM {src}),
        grams AS (SELECT doc_id, source, unnest({_sql_grams('w')}) AS g
                  FROM words),
        per AS (SELECT doc_id, ANY_VALUE(source) AS source,
                       ({h}) % {n_buckets} AS bucket, COUNT(*) AS c
                FROM grams GROUP BY doc_id, bucket),
        totals AS (SELECT doc_id, SUM(c) AS n_grams FROM per GROUP BY doc_id),
        tgt AS (SELECT bucket, SUM(c) AS t_b FROM per
                WHERE source = '{target_source}' GROUP BY bucket),
        raw AS (SELECT bucket, SUM(c) AS r_b FROM per GROUP BY bucket),
        nt AS (SELECT COALESCE(SUM(t_b), 0) AS n_target FROM tgt),
        nr AS (SELECT SUM(r_b) AS n_raw FROM raw),
        stats AS (SELECT r.bucket, COALESCE(t.t_b, 0) AS t_b, r.r_b,
                         nt.n_target, nr.n_raw
                  FROM raw r LEFT JOIN tgt t ON t.bucket = r.bucket
                  CROSS JOIN nt CROSS JOIN nr)
        SELECT p.doc_id,
               CAST(ANY_VALUE(t2.n_grams) AS BIGINT) AS n_grams,
               CAST(SUM(p.c * (s.t_b * s.n_raw - s.r_b * s.n_target))
                    AS BIGINT) AS score_scaled
        FROM per p
        JOIN stats s ON s.bucket = p.bucket
        JOIN totals t2 ON t2.doc_id = p.doc_id
        GROUP BY p.doc_id
    """
