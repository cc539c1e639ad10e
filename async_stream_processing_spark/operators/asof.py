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

import warnings
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
    single_partition: bool = False,
) -> DataFrame:
    """Attach the latest ``right_cols`` (as of each left row's ``(ts, seq)``)
    to every left row.

    ``on``: equi-keys to match within (e.g. ``["user_id"]``).
    ``strict``: if True, right rows at exactly the same ``(ts, seq)`` are
    NOT visible (strictly-before semantics).  The reference processes
    streams in FIFO order at equal times (SURVEY §3.4), so the default
    (inclusive) matches a quote registered before the trade stream.

    UNKEYED inputs delegate to :func:`asof_join_bucketed` (r9 verdict:
    default to the scale path instead of warning): a keyless
    union-and-carry sorts the whole union in ONE partition, while the
    time-bucketed form is exactly equivalent (property-tested) and
    embarrassingly parallel across buckets.  ``single_partition=True``
    forces the plain form — the differential tests use it to keep the
    two implementations independent."""
    on = list(on)
    if not on and not single_partition:
        return asof_join_bucketed(
            left, right, on=on, right_cols=right_cols, strict=strict
        )
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


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    right_cols: Sequence[str],
    tolerance_seconds: int,
    prefer_backward: bool = True,
) -> DataFrame:
    """NEAREST-match as-of join: each left row gets the right row with
    the smallest ``|Δts|`` within ``±tolerance_seconds`` (both
    directions -- the pandas ``merge_asof(direction='nearest',
    tolerance=...)`` semantics), nulls when nothing lands in the band.

    Tolerance makes this shuffle-joinable: bucket time by the tolerance,
    probe each left row into its own bucket and both neighbors (any
    right row within ±tol lives there), equi-join on (keys, bucket), and
    keep the argmin ``|Δts|`` per left row.  The left side fans out 3x
    pre-shuffle -- constant, independent of data or tolerance -- versus
    the carry-forward form's global per-key sort, and unlike plain
    ``asof_join`` it needs no order-carrying window at all, so skewed or
    absent keys cost nothing extra.  Ties: ``prefer_backward`` picks the
    earlier right row at equal distance (else the later), then ``(ts,
    seq)`` for full determinism.
    """
    on = list(on)
    right_cols = list(right_cols)
    tol_us = int(tolerance_seconds * 1_000_000)
    bucket = (F.unix_micros(F.col(TS)) / F.lit(tol_us)).cast("long")

    probes = left.select(
        *on, F.col(TS), F.col(SEQ),
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("__b"),
    )
    rhs = right.select(
        *[F.col(c) for c in on],
        F.col(TS).alias("__rts"), F.col(SEQ).alias("__rseq"),
        *[F.col(c) for c in right_cols],
    ).withColumn("__b", (F.unix_micros(F.col("__rts")) / F.lit(tol_us)).cast("long"))

    delta = F.unix_micros(F.col("__rts")) - F.unix_micros(F.col(TS))
    backward_rank = F.when(delta <= 0, 0 if prefer_backward else 1) \
        .otherwise(1 if prefer_backward else 0)
    cands = (
        probes.join(rhs, on + ["__b"])
        .filter(F.abs(delta) <= tol_us)
        .withColumn("__d", F.abs(delta))
        .withColumn("__pref", backward_rank)
    )
    w = Window.partitionBy(*on, TS, SEQ).orderBy(
        "__d", "__pref", "__rts", "__rseq"
    )
    best = (
        cands.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") == 1)
        .select(
            *on, TS, SEQ,
            F.col("__rts").alias("matched_ts"),
            *[F.col(c) for c in right_cols],
        )
    )
    return left.join(best, on + [TS, SEQ], "left")


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] = (),
    right_cols: Sequence[str] = (),
    bucket_seconds: int = 3600,
    strict: bool = False,
) -> DataFrame:
    """As-of join partitioned by TIME BUCKET on top of any equi-keys.

    The scale path for unkeyed or skewed-key as-of joins (SCALE.md): the
    plain union-and-carry sorts each key group in one partition, so no
    key (or one hot key) serializes.  Here the carry-forward window runs
    per ``(keys..., floor(ts / bucket))`` -- embarrassingly parallel
    across buckets -- and values cross bucket boundaries via a per-bucket
    summary relation (the last right-side payload of each bucket, one row
    per key x bucket) whose own prefix-carry is tiny.  Classic two-level
    scan/prefix decomposition: heavy data never sees a global sort.

    Exactly equivalent to :func:`asof_join` for any ``bucket_seconds``
    (property-tested); pick a bucket well above the median right-event
    spacing so most buckets carry internally.
    """
    on = list(on)
    right_cols = list(right_cols)
    bucket = (F.unix_micros(F.col(TS)) / F.lit(int(bucket_seconds * 1e6))) \
        .cast("long")

    lhs = left.withColumn("__side", F.lit(1)).withColumn("__b", bucket)
    rhs = (
        right.select(
            *[F.col(c) for c in on], F.col(TS), F.col(SEQ),
            *[F.col(c) for c in right_cols],
        )
        .withColumn("__side", F.lit(0))
        .withColumn("__b", bucket)
    )
    merged = lhs.unionByName(rhs, allowMissingColumns=True)

    end = -1 if strict else 0
    w_in = (
        Window.partitionBy(*on, "__b")
        .orderBy(F.col(TS), F.col(SEQ), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, end)
    )
    for c in right_cols:
        merged = merged.withColumn(f"__in_{c}", F.last(c, ignorenulls=True).over(w_in))

    # per-(key, bucket) final right payload: the value each bucket hands
    # to its successors (strictness is irrelevant across buckets -- every
    # prior-bucket row is strictly before).  One row per key x bucket.
    summary = (
        rhs.groupBy(*on, "__b")
        .agg(*[
            # last NON-NULL payload: the null-ordering key drops null-c
            # rows from the max, matching last(c, ignorenulls=True)
            F.max_by(
                F.col(c),
                F.when(F.col(c).isNotNull(), F.struct(F.col(TS), F.col(SEQ))),
            ).alias(c)
            for c in right_cols
        ])
    )
    # every bucket that appears anywhere needs a carry row, including
    # buckets with left rows only -- pin the summary onto the full bucket
    # spine, then ONE strictly-before window both shifts and propagates:
    # carry into bucket b = last non-null summary over buckets < b
    spine = merged.select(*on, "__b").distinct()
    w_spine = (
        Window.partitionBy(*on)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_full = spine.join(summary, on + ["__b"], "left").select(
        *on, "__b",
        *[
            F.last(c, ignorenulls=True).over(w_spine).alias(f"__carry_{c}")
            for c in right_cols
        ],
    )

    out = merged.filter(F.col("__side") == 1).join(
        carry_full, on + ["__b"], "left"
    )
    for c in right_cols:
        out = out.withColumn(
            c, F.coalesce(F.col(f"__in_{c}"), F.col(f"__carry_{c}"))
        )
    drop = ["__side", "__b"] + [f"__in_{c}" for c in right_cols] \
        + [f"__carry_{c}" for c in right_cols]
    return out.drop(*drop)
