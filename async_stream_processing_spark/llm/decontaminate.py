"""Benchmark decontamination and PII-style redaction.

* :func:`decontaminate` -- flag training documents that share any long
  n-gram with a benchmark/eval set (the GPT-3/PaLM "13-gram collision"
  procedure, here parameterized).  Plan shape: explode benchmark n-grams
  (small side) -> broadcast-join against exploded corpus n-grams ->
  aggregate hits per (doc, benchmark doc).  The corpus is touched once;
  at 100 TB the benchmark side is always broadcastable (eval sets are
  tiny) so there is NO corpus shuffle at all.
* :func:`redact` -- deterministic regex scrubbing (digit runs, email-like
  tokens) with per-doc redaction counts; pure codegen expressions, one
  scan, oracle-checkable (character-class regexes behave identically in
  Java regex and RE2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import stable_hash60
from ..functions.text import shingles

EMAIL_RE = "[a-zA-Z0-9.]+@[a-zA-Z0-9.]+"
DIGITS_RE = "[0-9]+"


def _ngram_hashes(docs: DataFrame, n: int, id_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col), F.explode(shingles("text", n)).alias("g")
    ).select(id_col, stable_hash60(F.col("g")).alias("h")).distinct()


def decontaminate(
    corpus: DataFrame, benchmark: DataFrame, n: int = 8
) -> DataFrame:
    """(doc_id, bench_id, n_collisions): corpus docs sharing >= 1 n-gram
    with a benchmark doc.  Anything returned here gets dropped (or flagged)
    before training."""
    corpus_g = _ngram_hashes(corpus, n, "doc_id")
    bench_g = _ngram_hashes(benchmark, n, "bench_id")
    return (
        corpus_g.join(F.broadcast(bench_g), "h")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_collisions"))
    )


def redact(docs: DataFrame, text: str = "text") -> DataFrame:
    """Scrub emails then digit runs; report per-doc counts of each."""
    t = F.col(text)
    n_emails = F.size(F.expr(f"regexp_extract_all({text}, '{EMAIL_RE}', 0)"))
    after_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_digits = F.size(F.expr(f"regexp_extract_all({text}, '{DIGITS_RE}', 0)"))
    cleaned = F.regexp_replace(after_email, DIGITS_RE, "<NUM>")
    return docs.select(
        "doc_id",
        cleaned.alias("clean_text"),
        n_emails.cast("long").alias("n_emails_redacted"),
        n_digits.cast("long").alias("n_numbers_redacted"),
    )
