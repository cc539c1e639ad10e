"""Interval (range) join: facts matched to dimension rows by a
``lo <= value < hi`` band predicate.

The reference has no join operators at all (its examples correlate
streams by callback state); a range join is the relational form of its
"classify this tick into a band" callbacks, and a training-data pipeline
uses it for bucketing scores into quality tiers, lengths into size
classes, timestamps into maintenance windows.

Spark's own planner turns a pure theta join into a broadcast
nested-loop join -- fine when the band table is small, catastrophic when
it is not (O(n*m) comparisons and the big side cannot shuffle-partition
on anything).  :func:`range_join` keeps the BNLJ for broadcast-sized
dims but offers the scale path: BUCKETIZE the value axis so the join
becomes an equi-join on bucket id + a residual band filter.  Each dim
row explodes to the ~``(hi-lo)/width`` buckets it covers; each fact row
computes one bucket.  The join then shuffles on bucket -- hash
partitionable, AQE-skew-splittable -- and the residual predicate runs
post-match.  Bucket width tunes fan-out vs selectivity: width ~ median
band length keeps dim fan-out near 1 while each fact meets only the
bands sharing its bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    facts: DataFrame,
    bands: DataFrame,
    value: str,
    lo: str = "lo",
    hi: str = "hi",
    bucket_width: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``facts`` to ``bands`` where ``lo <= facts[value] < hi``.

    ``bucket_width=None`` -> plain theta join (planner broadcasts small
    ``bands``; only safe when bands IS small).  With a width, the
    bucketized equi-join runs instead -- same rows, shuffle-joinable.
    Bands must be half-open and may overlap; a fact matches every band
    covering it.
    """
    pred = (F.col(lo) <= F.col(value)) & (F.col(value) < F.col(hi))
    if bucket_width is None:
        return facts.join(bands, pred, how)
    w = float(bucket_width)
    # dim side: every bucket the band [lo, hi) intersects.  Empty bands
    # (lo >= hi) match nothing by definition -- dropping them up front
    # also keeps the covering `sequence` ascending (a descending range
    # would emit junk candidate buckets the residual filter then pays
    # to discard).
    bands_b = bands.filter(F.col(lo) < F.col(hi)).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / w).cast("long"),
                # hi is exclusive: a band ending exactly on a bucket
                # boundary does not reach into that bucket
                F.floor(
                    F.when(
                        F.col(hi) == F.floor(F.col(hi) / w) * w,
                        F.col(hi) - w,
                    ).otherwise(F.col(hi))
                    / w
                ).cast("long"),
            )
        ),
    )
    facts_b = facts.withColumn(
        "__bucket", F.floor(F.col(value) / w).cast("long")
    )
    return facts_b.join(bands_b, ["__bucket"], how).filter(pred).drop("__bucket")
