"""Fuzzy record linkage: blocked edit-distance joins.

The reference engine has no string-matching surface at all (its examples
correlate streams by exact callback keys -- SURVEY §2 checklist), but a
user replacing it for data work hits entity resolution immediately:
catalog rows, user registrations and vendor feeds arrive with typos and
near-duplicate spellings, and "join where the names are ALMOST equal" is
the operator that reconciles them.  A training-data pipeline uses the
same shape to reconcile source registries and to collapse near-duplicate
entity mentions before counting.

The naive form is a cross join with ``levenshtein() <= d`` -- O(n*m)
string comparisons, each itself O(L^2); unusable beyond toy sizes.  The
standard scale answer (Fellegi-Sunter style record linkage) is
BLOCKING: only pairs that agree on at least one cheap deterministic
block key (a token, a prefix, a phonetic code) are ever compared.  That
turns the plan into

    explode block keys -> equi-join on block key (hash-shuffleable)
    -> drop duplicate candidate pairs (multi-pass blocking overlaps)
    -> cheap length-band prefilter -> levenshtein residual

so the only shuffle is the block-key equi-join, AQE can split a skewed
block, and the expensive edit distance runs once per surviving candidate
on the JVM (`F.levenshtein`, no Python).  Recall is controlled by the
block design, not the join: a pair is missed only if NO block pass
captures it (tests measure blocked recall against the exact all-pairs
ground truth at fixture scale).

At 100 TB: block keys distribute like tokens (Zipfian) -- a stop-word
block is the classic hot key.  Mitigations, in order: choose selective
blocks (rarest token, not first token), cap block size (drop blocks
larger than a bound -- standard in ER systems, surfaced here via
``max_block_size``), and AQE skew-join handles the residual imbalance.
The length-band prefilter is free (|len(a)-len(b)| > d implies
levenshtein > d) and prunes before any O(L^2) work.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BlockFn = Callable[[Column], Sequence[Column]]


def _suffix_all(df: DataFrame, suffix: str) -> DataFrame:
    return df.select([F.col(c).alias(c + suffix) for c in df.columns])


def token_blocks(first_n: int = 1, last_n: int = 1) -> BlockFn:
    """Multi-pass blocking on whitespace tokens: the first ``first_n``
    and last ``last_n`` tokens each open a block.  Two strings meet if
    they share ANY of those tokens in the same position class."""

    def blocks(text: Column) -> list[Column]:
        toks = F.split(text, " +")
        out: list[Column] = []
        # try_element_at: short strings yield NULL blocks (filtered by
        # the caller), never an ANSI out-of-bounds error
        for i in range(first_n):
            out.append(F.concat(F.lit(f"f{i}:"), F.try_element_at(toks, F.lit(i + 1))))
        for i in range(last_n):
            out.append(
                F.concat(F.lit(f"l{i}:"), F.try_element_at(toks, F.lit(-(i + 1))))
            )
        return out

    return blocks


def blocked_levenshtein_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_text: str,
    right_text: str,
    blocks: BlockFn,
    max_dist: int = 2,
    min_dist: int = 0,
    max_block_size: int | None = None,
    suffixes: tuple[str, str] = ("_a", "_b"),
    pair_filter: Column | None = None,
) -> DataFrame:
    """Pairs (all left columns + ``suffixes[0]``, all right columns +
    ``suffixes[1]``, ``edit_distance``) where the two text values agree
    on at least one block key and ``min_dist <= levenshtein <= max_dist``.

    ``left_key``/``right_key`` must be unique per row -- candidate pairs
    from overlapping block passes are deduplicated on the key pair
    (duplicates are whole-row identical, so the kept row is
    well-defined).  ``max_block_size=None`` keeps every block; a bound
    drops blocks larger than it on EACH side (the ER hot-block cap --
    recall loss is confined to pairs whose every shared block is hot).
    """
    sa, sb = suffixes
    la = _suffix_all(left, sa)
    rb = _suffix_all(right, sb)

    def exploded(df: DataFrame, text_col: str) -> DataFrame:
        out = df.withColumn(
            "__blk", F.explode(F.array(*blocks(F.col(text_col))))
        ).filter(F.col("__blk").isNotNull())
        if max_block_size is not None:
            # per-side block cardinality; one extra aggregation on the
            # (block, count) relation.  NO forced broadcast: the size
            # relation is block-count-sized (≈ token vocabulary at
            # corpus scale, far past broadcast limits) — the planner
            # broadcasts it when small, shuffles on __blk otherwise,
            # which co-partitions with the candidate join anyway.
            sizes = out.groupBy("__blk").agg(F.count(F.lit(1)).alias("__bn"))
            out = out.join(
                sizes.filter(F.col("__bn") <= max_block_size), "__blk"
            ).drop("__bn")
        return out

    ta, tb = F.col(left_text + sa), F.col(right_text + sb)
    band = F.abs(F.length(ta) - F.length(tb)) <= max_dist
    # cheap row-deterministic predicates run BEFORE the dedup shuffle:
    # duplicate candidates from overlapping block passes are whole-row
    # identical, so filtering first keeps the same surviving pair set
    # while the (key_a, key_b) dedup exchange moves only banded (and,
    # for self-joins, half as many) candidates.
    raw = (
        exploded(la, left_text + sa)
        .join(exploded(rb, right_text + sb), "__blk")
        .drop("__blk")
        .filter(band)
    )
    if pair_filter is not None:
        raw = raw.filter(pair_filter)
    cand = raw.dropDuplicates([left_key + sa, right_key + sb])
    # banded DP: levenshtein(a, b, threshold) computes min(dist, t+1) in
    # O(len * t) instead of O(len^2) and returns -1 past the threshold;
    # kept rows satisfy dist <= max_dist, where the banded result equals
    # the exact distance, and -1 can never pass `>= min_dist` (>= 0)
    dist = F.levenshtein(ta, tb, max_dist)
    return (
        cand.withColumn("edit_distance", dist.cast("long"))
        .filter(
            (F.col("edit_distance") >= min_dist)
            & (F.col("edit_distance") <= max_dist)
        )
    )


def fuzzy_self_pairs(
    df: DataFrame,
    key: str,
    text: str,
    blocks: BlockFn,
    max_dist: int = 2,
    min_dist: int = 1,
    max_block_size: int | None = None,
) -> DataFrame:
    """Self-linkage: unordered pairs (``key_a < key_b``) of rows of one
    relation whose texts are within edit distance.  ``min_dist=1``
    excludes self/exact matches by default (exact duplicates are the
    hash-groupBy dedup operator's job, not fuzzy matching's)."""
    # the unordered-pair filter is pushed into the join as pair_filter:
    # it halves the candidate set BEFORE the dedup shuffle and the
    # edit-distance work, instead of after both
    return blocked_levenshtein_join(
        df, df, key, key, text, text, blocks,
        max_dist=max_dist, min_dist=min_dist,
        max_block_size=max_block_size,
        pair_filter=F.col(key + "_a") < F.col(key + "_b"),
    )


def sql_token_blocked_self_pairs(
    src_entities: str,
    first_n: int = 1,
    last_n: int = 1,
    max_dist: int = 2,
    min_dist: int = 1,
    extra_cols: str = "",
) -> str:
    """DuckDB twin of :func:`fuzzy_self_pairs` with :func:`token_blocks`
    blocking, parameterized on the same knobs — the gate oracle and the
    randomized differential test both derive from this one template.
    ``src_entities`` must be a CTE body selecting (name, ...); pass any
    carried columns through ``extra_cols`` (e.g. ``", support"``)."""
    passes = [
        f"'f{i}:' || string_split_regex(name, ' +')[{i + 1}]"
        for i in range(first_n)
    ] + [
        f"'l{i}:' || string_split_regex(name, ' +')[-{i + 1}]"
        for i in range(last_n)
    ]
    extras = [c.strip() for c in extra_cols.split(",") if c.strip()]
    sel_a = "".join(f", a.{c} AS {c}_a" for c in extras)
    sel_b = "".join(f", c.{c} AS {c}_b" for c in extras)
    out_extras = "".join(f", {c}_a, {c}_b" for c in extras)
    return f"""
        WITH e AS ({src_entities}),
        b AS (
            SELECT name{extra_cols}, blk FROM (
                SELECT name{extra_cols},
                       unnest([{", ".join(passes)}]) AS blk
                FROM e)
            WHERE blk IS NOT NULL),
        cand AS (
            SELECT DISTINCT a.name AS name_a{sel_a},
                            c.name AS name_b{sel_b}
            FROM b a JOIN b c ON a.blk = c.blk AND a.name < c.name
            WHERE abs(length(a.name) - length(c.name)) <= {max_dist})
        SELECT name_a, name_b{out_extras},
               CAST(levenshtein(name_a, name_b) AS BIGINT) AS edit_distance
        FROM cand
        WHERE levenshtein(name_a, name_b)
              BETWEEN {min_dist} AND {max_dist}
    """
