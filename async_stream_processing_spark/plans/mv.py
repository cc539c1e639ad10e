"""Incremental materialized-view maintenance over the versioned lake.

The lake's change-data feed (:func:`plans.versioned.table_changes`,
``row_level=True``) reports the exact row-level delta between two
versions while reading only the differenced files.  That is precisely
the contract incremental view maintenance needs: a grouped SUM/COUNT
view of a 100 TB table can follow the table version-by-version at
O(changed rows) cost per step instead of an O(table) recompute — the
Delta/materialized-lake pattern a reporting or feature-store layer sits
on.  (The reference engine's analog is a callback accumulating per-key
state as events arrive — processor.py:75-91 dispatch loop; here the
"events" are the lake's committed row deltas, so the accumulator
survives restarts and replays exactly.)

Correctness rests on two facts, both pytest-pinned:

1. ``row_level=True`` CDF is an exact multiset delta — an update is its
   delete(preimage)+insert(postimage) pair, carried copy-on-write rows
   net to nothing, deletion-vector deltas surface as deletes — so
   folding ``+row`` per insert and ``-row`` per delete over ANY version
   chain reproduces the direct aggregate bit-for-bit when the measures
   are integers (the repo-wide integer-cents discipline).
2. SUM/COUNT are self-inverse under that signed fold (no re-scan needed
   for deletes, unlike MIN/MAX — which would need per-group recompute
   of affected keys; documented non-goal here).

Contract: the measure column must be NON-NULL integers (coalesce /
cast upstream, as the gates' integer-cents derivation does).  With
NULLs, SQL SUM yields NULL for an all-NULL group where the incremental
fold's coalesce-to-0 arithmetic yields 0 — a drift this module chooses
not to paper over silently.

Scale shape: the delta aggregation shuffles O(changed rows) on the view
key; the refresh joins view-sized + delta-key-sized relations.  At
100 TB the view itself lives as a lake table and the refresh lands via
``merge_into`` keyed on the group columns (join-then-merge: compute the
new totals for touched keys, MERGE upserts them, ``n_rows=0`` keys
delete) — the gate keeps the view relational to stay oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .versioned import table_changes


def sum_count_view(df: DataFrame, keys: list[str], measure: str) -> DataFrame:
    """The view definition: per-key row count and integer measure sum.
    Used both to seed the incremental chain (at the base version) and
    as the full-recompute twin the tests compare against."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(measure).cast("long").alias("sum_m"),
    )


def apply_changes(
    view: DataFrame, changes: DataFrame, keys: list[str], measure: str
) -> DataFrame:
    """One maintenance step: fold a row-level change feed (columns =
    table columns + ``_change_type`` in {'insert','delete'}) into the
    view.  Inserts add, deletes subtract; keys whose count reaches zero
    leave the view (so a fully-deleted group disappears exactly as a
    recompute would drop it)."""
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    delta = changes.groupBy(*keys).agg(
        F.sum(sign).cast("long").alias("__dn"),
        F.sum(sign * F.col(measure)).cast("long").alias("__dm"),
    )
    merged = view.join(delta, keys, "full_outer").select(
        *keys,
        (F.coalesce(F.col("n_rows"), F.lit(0))
         + F.coalesce(F.col("__dn"), F.lit(0))).alias("n_rows"),
        (F.coalesce(F.col("sum_m"), F.lit(0))
         + F.coalesce(F.col("__dm"), F.lit(0))).alias("sum_m"),
    )
    return merged.filter(F.col("n_rows") > 0)


def maintain_view(
    spark: SparkSession,
    path: str,
    view: DataFrame,
    keys: list[str],
    measure: str,
    v_from: int,
    v_to: int,
    step: int = 1,
    prepare=None,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Advance ``view`` (valid at ``v_from``) to ``v_to`` by folding the
    row-level CDF one version-window at a time (``step`` versions per
    window; the per-window cost is O(rows changed in that window)).
    Stepping version-by-version and jumping straight to ``v_to`` give
    identical results (CDF deltas compose); tests pin that.

    ``prepare`` (optional) maps each change-feed DataFrame before the
    fold — for views grouped on DERIVED keys (a bucket of the table
    key, a date grain of a timestamp), apply the same derivation here
    that seeded the base view.

    Every ``checkpoint_every`` windows the view's lineage is truncated
    (``localCheckpoint``): each fold stacks a join + aggregation on the
    plan, and a long version chain would otherwise hand the analyzer an
    O(windows)-deep tree.  At cluster scale swap for reliable
    checkpointing, or land each refresh via ``merge_into`` (module
    docstring) — a persisted view is its own lineage barrier."""
    v = v_from
    folds = 0
    while v < v_to:
        nxt = min(v + step, v_to)
        ch = table_changes(spark, path, v, nxt, row_level=True)
        if prepare is not None:
            ch = prepare(ch)
        view = apply_changes(view, ch, keys, measure)
        folds += 1
        if checkpoint_every and folds % checkpoint_every == 0 and nxt < v_to:
            view = view.localCheckpoint(eager=True)
        v = nxt
    return view
