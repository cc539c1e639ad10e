"""As-of join: each left event matched to the most recent right event.

The reference's ``Book`` (``/root/reference/examples/csp/01_basics/
e4_trade_pnl.py:36-70``) marks every trade at the latest quote state as of
the trade's event time -- the canonical as-of join.  Spark SQL has no native
as-of join; the idiomatic distributed implementation is the union-and-carry
pattern: union both relations on the global ``(ts, seq)`` order, carry the
right side's payload forward with ``last(..., ignoreNulls)``, and keep the
left rows.  One shuffle + one per-partition sort; no driver loop, no
broadcast of the full right side.

For very large right sides with a key, partition by the key (per-instrument
quotes) -- the carry-forward window is then per-key and fully parallel.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.event_relation import SEQ, TS


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] = (),
    right_cols: Sequence[str] = (),
    strict: bool = False,
) -> DataFrame:
    """Attach the latest ``right_cols`` (as of each left row's ``(ts, seq)``)
    to every left row.

    ``on``: equi-keys to match within (e.g. ``["user_id"]``).
    ``strict``: if True, right rows at exactly the same ``(ts, seq)`` are
    NOT visible (strictly-before semantics).  The reference processes
    streams in FIFO order at equal times (SURVEY §3.4), so the default
    (inclusive) matches a quote registered before the trade stream.
    """
    on = list(on)
    right_cols = list(right_cols)
    lhs = left.withColumn("__side", F.lit(1))
    rhs = right.select(
        *[F.col(c) for c in on], F.col(TS), F.col(SEQ),
        *[F.col(c) for c in right_cols],
    ).withColumn("__side", F.lit(0))
    merged = lhs.unionByName(rhs, allowMissingColumns=True)

    end = -1 if strict else 0
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(TS), F.col(SEQ), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, end)
    )
    for c in right_cols:
        merged = merged.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return merged.filter(F.col("__side") == 1).drop("__side")
