"""Text primitives shared by the LLM-pipeline operators.

All column expressions here have exact ANSI-SQL twins (the ``sql_*``
renderings) so every text operator stays oracle-checkable.  Tokenization is
whitespace-based (the driver's ``documents.text`` is space-separated), with
a regex fallback for token *counting* that approximates a BPE pre-tokenizer
(letter runs / digit runs / single punctuation).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind1(col: Column, build) -> Column:
    """Evaluate ``col`` ONCE and feed it to ``build`` as a bound lambda
    variable: ``element_at(transform(array(col), build), 1)``.

    Spark evaluates higher-order-function subtrees interpreted, with no
    common-subexpression elimination — an expression tree that
    references ``col`` k times evaluates it k times per row.  A lambda
    variable, by contrast, is evaluated once and each reference is a
    bound-value read.  The wrapper array is one element, so the rewrite
    is value-transparent for every input including NULL (``array(c)``
    is ``[NULL]``, and ``build`` sees exactly the NULL the inline form
    would)."""
    return F.element_at(F.transform(F.array(col), build), 1)


def tokens(col: Column | str = "text") -> Column:
    """Lower-cased whitespace tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), " +")


def sql_tokens(expr: str = "text") -> str:
    return f"string_split_regex(lower(trim({expr})), ' +')"


def shingles(col: Column | str = "text", n: int = 3) -> Column:
    """Word n-gram shingles as strings (space-joined).

    Built as a ``zip_with`` fold over ``n`` shifted slices of the token
    array -- O(words) per document.  (The naive per-index ``transform`` +
    ``slice`` is O(words^2) and measured 10x slower on the driver corpus.)
    Documents shorter than ``n`` words yield an empty array.

    The token array is bound ONCE through a single-element-array
    ``transform`` lambda: HOF subtrees run interpreted with no common-
    subexpression elimination, so the former inline form re-tokenized
    the document per slice reference (~2n+2 ``split``s per row; 18 for
    the 8-gram decontaminate pass).  A lambda variable is evaluated
    once and referenced for free.  A/B at sf0.1 (explode+md5, warm
    noop): n=3 1.5 s -> 0.7 s, n=8 2.2 s -> 1.1 s; values bit-identical
    (exceptAll both ways = 0, and the expression over the bound array
    is the same tree as over the inline one).
    """
    w = tokens(col)

    def build(wa: Column) -> Column:
        length = F.size(wa) - (n - 1)
        out = F.slice(wa, 1, length)
        for k in range(1, n):
            out = F.zip_with(
                out,
                F.slice(wa, k + 1, length),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        return F.when(length > 0, out).otherwise(
            F.array().cast("array<string>")
        )

    return bind1(w, build)


def sql_shingles(expr: str = "text", n: int = 3) -> str:
    """DuckDB twin of :func:`shingles`; lambda index is 1-based there.
    The token-list expression is inlined (DuckDB lambdas can't hold
    subqueries); pair with a CTE exposing one ``words`` column to keep
    oracle SQL readable: ``sql_shingles('words')``."""
    w = expr
    joined = " || ' ' || ".join(f"({w})[i + {k}]" for k in range(n))
    return (
        f"list_filter(list_transform({w}, (x, i) -> "
        f"CASE WHEN i + {n - 1} <= len({w}) THEN {joined} END), "
        f"x -> x IS NOT NULL)"
    )


# A deliberately tiny, documented stopword table for language ID -- the
# operator demonstrates the n-gram/stopword-voting heuristic, not a
# production model (swap in fastText/CLD3 off-Spark for real runs).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "zh": ["的", "是", "不", "了", "在", "人", "有", "我"],
}

#: BPE-ish pre-tokenizer: letter runs, digit runs, single non-alnum marks.
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
