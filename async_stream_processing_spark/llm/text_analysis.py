"""Text analysis for training-data pipelines: stats, quality, language ID,
token counting, fingerprinting.

All pure column expressions (whole-stage codegen, no UDFs) with bit-exact
DuckDB twins: ratios are single double divisions of exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import BPE_TOKEN_RE, LANG_STOPWORDS, tokens


def text_stats(docs: DataFrame, text: str = "text") -> DataFrame:
    """Per-doc size/quality fundamentals: chars, words, unique words,
    type-token ratio, mean word length."""
    docs = docs.withColumn("__words", tokens(text))
    w = F.col("__words")
    n_words = F.size(w)
    n_unique = F.size(F.array_distinct(w))
    total_len = F.aggregate(
        F.transform(w, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    return docs.select(
        "doc_id",
        F.length(F.col(text)).cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        n_unique.cast("long").alias("n_unique_words"),
        (n_unique.cast("double") / n_words.cast("double")).alias("type_token_ratio"),
        (total_len.cast("double") / n_words.cast("double")).alias("avg_word_len"),
    )


def quality_score(docs: DataFrame, text: str = "text") -> DataFrame:
    """Heuristic quality signals (Gopher/C4-style rules, simplified):
    stopword ratio, punctuation density, digit density, plus a composite
    0-100 score.  Deterministic integer counts -> one double division each.
    """
    t = F.col(text)
    docs = docs.withColumn("__words", tokens(text))
    w = F.col("__words")
    n_words = F.size(w)
    en_stop = F.array(*[F.lit(s) for s in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(en_stop, x)))
    n_punct = F.length(t) - F.length(F.regexp_replace(t, "[^a-zA-Z0-9 ]", ""))
    n_digit = F.length(t) - F.length(F.regexp_replace(t, "[0-9]", ""))
    stop_ratio = n_stop.cast("double") / n_words.cast("double")
    punct_ratio = n_punct.cast("double") / F.length(t).cast("double")
    digit_ratio = n_digit.cast("double") / F.length(t).cast("double")
    score = (
        F.lit(100.0)
        * (F.lit(0.5) * F.least(stop_ratio * 5, F.lit(1.0))
           + F.lit(0.25) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0)))
           + F.lit(0.25) * (F.lit(1.0) - F.least(digit_ratio * 10, F.lit(1.0))))
    )
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        n_stop.cast("long").alias("n_stopwords"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        score.alias("quality_score"),
    )


def lang_id(docs: DataFrame, text: str = "text") -> DataFrame:
    """Stopword-voting language ID: per language, count token hits in a
    tiny stopword table; argmax with lexicographic tiebreak; 'und' when no
    language scores a hit.  A demonstrator of the heuristic shape -- swap a
    real model (fastText) behind the same signature for production.

    The token array is materialized once (``__words``) so Catalyst doesn't
    re-split the text for each of the 5 language votes."""
    docs = docs.withColumn("__words", tokens(text))
    w = F.col("__words")
    def contains(arr):
        return lambda x: F.array_contains(arr, x)

    hit_cols = []
    for lang, stops in sorted(LANG_STOPWORDS.items()):
        arr = F.array(*[F.lit(s) for s in stops])
        hits = F.size(F.filter(w, contains(arr)))
        hit_cols.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # argmax with deterministic tiebreak: max hits, then smallest lang code.
    max_hits = F.greatest(*[c.getField("hits") for c in hit_cols])
    winner = F.array(*[
        F.when(c.getField("hits") == max_hits, c.getField("lang"))
        for c in hit_cols
    ])
    first_winner = F.array_min(F.filter(winner, lambda x: x.isNotNull()))
    return docs.select(
        "doc_id",
        F.when(max_hits > 0, first_winner).otherwise(F.lit("und")).alias("lang_pred"),
        max_hits.alias("n_hits"),
        F.col("lang").alias("lang_label"),
    )


def token_counts(docs: DataFrame, text: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword count (letter runs, digit
    runs, single punctuation marks) + a chars/4 heuristic, per doc."""
    n_ws = F.size(tokens(text))
    n_bpe = F.size(F.expr(f"regexp_extract_all({text}, '{BPE_TOKEN_RE}', 0)"))
    return docs.select(
        "doc_id",
        n_ws.cast("long").alias("n_ws_tokens"),
        n_bpe.cast("long").alias("n_bpe_tokens"),
        (F.length(F.col(text)).cast("double") / F.lit(4.0)).alias("n_tok_est"),
    )


def fingerprints(docs: DataFrame, text: str = "text") -> DataFrame:
    """Deterministic document fingerprints: full-text md5 (exact dedup key)
    + first-8-shingle rolling window fingerprint (content-defined; the
    md5-min over a shingle window approximates winnowing's minimum-hash
    selection)."""
    from ..functions.hashing import stable_hash60
    from ..functions.text import shingles

    # materialize the normalized text and shingle array once each
    docs = docs.withColumn("__norm", F.lower(F.trim(F.col(text)))).withColumn(
        "__sh8", F.slice(shingles(text, 3), 1, 8)
    )
    window_min = F.array_min(F.transform(F.col("__sh8"), lambda s: F.md5(s)))
    return docs.select(
        "doc_id",
        F.md5(F.col("__norm")).alias("md5_fingerprint"),
        window_min.alias("winnow_fingerprint"),
        stable_hash60(F.col("__norm")).alias("hash60"),
    )
