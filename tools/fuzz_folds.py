"""Differential fuzzer for the bounded-state streaming folds.

The round-9 incremental folds (``streaming/folds.py``) carry O(1)
sufficient statistics per key through ``applyInPandasWithState``; their
exactness contract is "bit-identical to the batch closed-form fold over
the (ts, event_id)-sorted event list".  The five gated queries pin five
parameterizations; this fuzzer is the sequence-level adversary for the
MACHINERY: each case draws a random

* fold kind        — cusum / ewma / rsi / ols / drawdown,
* fold parameters  — slack/threshold, EWMA weights, Wilder period,
* input subset     — a random predicate over the events table,
* delivery shape   — 2..4 time-split files (micro-batch count),

replays the subset through the streaming engine, and compares the final
per-key integer statistics EXACTLY against an independent batch twin
built from ``array_sort(collect_list(...))`` + ``F.aggregate`` (the
round-8 full-history formulation, kept here as the oracle).  Any
drift in cross-batch state carry, batch-boundary ordering, or the
Python/Spark integer-division dialects fails the case.

Usage: python tools/fuzz_folds.py [n_cases] [seed] [sf_dir]
Also driven by tests/test_streaming.py with pinned seeds.
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

CENTS = "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"


def _split_write(spark, df, n_parts: int, jitter_s: int = 0) -> str:
    """Land ``df`` as n_parts files with ascending mtimes (one
    micro-batch each, oldest-first).  ``jitter_s=0``: strict
    (ts, event_id) order across files (the ordered folds' contract);
    ``jitter_s>0``: files bucket by a deterministically JITTERED event
    time, so consecutive micro-batches interleave out of order within
    ±jitter — the reorder-buffered twins' fixture shape."""
    from pyspark.sql import Window

    d = tempfile.mkdtemp(prefix="asp_foldfuzz_")
    if jitter_s:
        j_us = jitter_s * 1_000_000
        jit = (F.pmod(F.xxhash64("event_id"), F.lit(2 * j_us + 1))
               - F.lit(j_us))
        key = F.unix_micros(F.col("ts")) + jit
        parts = df.withColumn(
            "__b", F.ntile(n_parts).over(Window.orderBy(key, "event_id")) - 1
        )
    else:
        parts = df.withColumn(
            "__b",
            F.ntile(n_parts).over(Window.orderBy("ts", "event_id")) - 1,
        )
    sub = os.path.join(d, "__by_bucket")
    parts.repartition(n_parts, "__b").write.partitionBy("__b") \
        .mode("overwrite").parquet(sub)
    for i in range(n_parts):
        bdir = os.path.join(sub, f"__b={i}")
        part = next(
            f for f in os.listdir(bdir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        dst = os.path.join(d, f"events_{i:03d}.parquet")
        os.replace(os.path.join(bdir, part), dst)
        os.utime(dst, (1_600_000_000 + i * 10, 1_600_000_000 + i * 10))
    shutil.rmtree(sub)
    return d


def _arr(x_alias: str):
    return F.array_sort(
        F.collect_list(F.struct("ts", "event_id", F.expr(CENTS).alias(x_alias)))
    )


def _batch_cusum(df, slack: int, th: int):
    agg = df.groupBy("user_id").agg(_arr("x").alias("arr"))
    first = F.element_at(F.col("arr"), 1)["x"]
    zero = F.lit(0).cast("long")
    init = F.struct(
        zero.alias("c"), zero.alias("m"), zero.alias("smax"),
        zero.alias("n_over"), F.lit(None).cast("long").alias("alarm"),
    )

    def step(acc, e):
        c2 = acc["c"] + (e["x"] - first - F.lit(slack).cast("long"))
        m2 = F.least(acc["m"], c2)
        sv = c2 - m2
        over = sv > F.lit(th).cast("long")
        return F.struct(
            c2.alias("c"), m2.alias("m"),
            F.greatest(acc["smax"], sv).alias("smax"),
            (acc["n_over"] + F.when(over, F.lit(1).cast("long"))
             .otherwise(zero)).alias("n_over"),
            F.least(acc["alarm"], F.when(over, e["event_id"])).alias("alarm"),
        )

    folded = F.aggregate(F.col("arr"), init, step)
    return agg.select(
        "user_id", folded["smax"].alias("smax"),
        folded["n_over"].alias("n_over"), folded["alarm"].alias("alarm"),
        F.size("arr").cast("long").alias("n"),
    )


def _batch_ewma(df, w_old: int, w_new: int, den: int):
    agg = df.groupBy("user_id").agg(_arr("x").alias("arr"))
    xs = F.transform(F.col("arr"), lambda a: a["x"])

    def step(acc, v):
        y = acc * w_old + v * w_new
        return ((y - y % den) / den).cast("long")

    ew = F.aggregate(
        F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))),
        F.element_at(xs, 1), step,
    )
    return agg.select(
        "user_id", ew.alias("ew"),
        F.size("arr").cast("long").alias("n"),
    )


def _batch_rsi(df, period: int):
    agg = df.groupBy("user_id").agg(_arr("y").alias("arr"))
    ys = F.transform(F.col("arr"), lambda a: a["y"])
    n = F.size(ys)
    diffs = F.transform(
        F.slice(ys, 2, F.greatest(n - 1, F.lit(0))),
        lambda v, i: v - F.element_at(ys, i + 1),
    )
    gs = F.transform(diffs, lambda d: F.greatest(d, F.lit(0)) * 1_000_000)
    ls = F.transform(diffs, lambda d: F.greatest(-d, F.lit(0)) * 1_000_000)

    def wilder(xs):
        def step(acc, v):
            t = acc * (period - 1) + v
            return ((t - t % period) / period).cast("long")

        return F.aggregate(
            F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))),
            F.element_at(xs, 1), step,
        )

    return agg.select(
        "user_id", F.size(diffs).cast("long").alias("n_diffs"),
        wilder(gs).alias("ag"), wilder(ls).alias("al"),
    ).filter(F.col("n_diffs") >= 1)


def _batch_ols(df):
    agg = df.groupBy("user_id").agg(_arr("y").alias("arr"))
    ys = F.transform(F.col("arr"), lambda a: a["y"])
    n = F.size(ys).cast("long")
    zero = F.lit(0).cast("long")
    sy = F.aggregate(ys, zero, lambda acc, v: acc + v)
    syy = F.aggregate(ys, zero, lambda acc, v: acc + v * v)
    sxy = F.aggregate(
        F.zip_with(ys, F.sequence(F.lit(1).cast("long"), n),
                   lambda yv, xv: xv * yv),
        zero, lambda acc, v: acc + v,
    )
    return agg.select(
        "user_id", n.alias("n"), sy.alias("sy"), sxy.alias("sxy"),
        syy.alias("syy"),
    )


def _batch_bollinger(df, n_rows: int):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(-(n_rows - 1), 0)
    x = F.expr(CENTS)
    return df.select(
        "user_id", "ts", "event_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum(x).over(w).cast("long").alias("sx_c"),
        F.sum(x * x).over(w).cast("long").alias("sxx_c4"),
    )


def _batch_corr(df, n_rows: int):
    from pyspark.sql import Window

    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w = wl.rowsBetween(-(n_rows - 1), 0)
    x = F.expr(CENTS)
    lagged = df.withColumn("__y", F.lag(x, 1).over(wl))
    y = F.col("__y")
    return lagged.select(
        "user_id", "ts", "event_id",
        F.count("__y").over(w).cast("long").alias("n"),
        F.coalesce(F.sum(F.when(y.isNotNull(), x)).over(w), F.lit(0))
        .cast("long").alias("sx_c"),
        F.coalesce(F.sum(y).over(w), F.lit(0)).cast("long").alias("sy_c"),
        F.coalesce(F.sum(x * y).over(w), F.lit(0))
        .cast("long").alias("sxy_c4"),
        F.coalesce(F.sum(F.when(y.isNotNull(), x * x)).over(w), F.lit(0))
        .cast("long").alias("sxx_c4"),
        F.coalesce(F.sum(y * y).over(w), F.lit(0))
        .cast("long").alias("syy_c4"),
    )


def _batch_drawdown(df):
    agg = df.groupBy("user_id").agg(_arr("x").alias("arr"))
    xs = F.transform(F.col("arr"), lambda a: a["x"])
    first = F.element_at(xs, 1)
    init = F.struct(first.alias("eq"), first.alias("peak"),
                    F.lit(0).cast("long").alias("dd"))

    def step(acc, v):
        eq2 = acc["eq"] + v
        peak2 = F.greatest(acc["peak"], eq2)
        return F.struct(eq2.alias("eq"), peak2.alias("peak"),
                        F.greatest(acc["dd"], peak2 - eq2).alias("dd"))

    folded = F.aggregate(
        F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))), init, step)
    return agg.select(
        "user_id", folded["eq"].alias("eq"), folded["peak"].alias("peak"),
        folded["dd"].alias("dd"), F.size(xs).cast("long").alias("n"),
    )


def _max_nb(out):
    """Per-(user, event) row with the highest emission sequence -- the
    reorder twins' drained-final-row convention."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_id").orderBy(F.desc("nb"))
    return (
        out.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1).drop("__rk", "nb")
    )


def _finals(spark, folded_stream, n_col: str = "n"):
    from pyspark.sql import Window

    from async_stream_processing_spark.streaming.replay import drain

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        out = drain(folded_stream, output_mode="append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    w = Window.partitionBy("user_id").orderBy(F.desc(n_col))
    return (
        out.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1).drop("__rk")
    )


PREDS = [
    ("all", "true"),
    ("low_value", "value < 80"),
    ("high_value", "value >= 20"),
    ("clicks_views", "event_type IN ('click', 'view')"),
    ("mod3", "event_id % 3 != 1"),
    ("mod7", "event_id % 7 != 0"),
]


def run_case(spark, rng: random.Random, sf_dir: str) -> str:
    from async_stream_processing_spark.sources.parquet import load_table
    from async_stream_processing_spark.streaming.folds import (
        cusum_fold_stream,
        drawdown_fold_stream,
        ewma_fold_stream,
        ols_fold_stream,
        rsi_fold_stream,
    )

    from async_stream_processing_spark.streaming.folds import (
        BOLLINGER_K,
        bollinger_fold_stream,
        corr_fold_stream,
    )

    from async_stream_processing_spark.streaming.reorder import (
        reordered_bollinger_stream,
        reordered_corr_stream,
        reordered_fold_stream,
    )

    pred_name, pred = rng.choice(PREDS)
    n_parts = rng.choice([2, 3, 4])
    kind = rng.choice(["cusum", "ewma", "rsi", "ols", "drawdown",
                       "bollinger", "corr"])
    # delivery shape: ordered replay drives the zero-buffer folds;
    # jittered replay (±2 h, < half the 5 h watermark delay) drives the
    # reorder-buffered twins -- SAME batch oracles for both
    shuffled = rng.random() < 0.5
    delay = "18000 seconds"
    df = load_table(spark, sf_dir, "events").filter(F.expr(pred))
    d = _split_write(spark, df, n_parts, jitter_s=7200 if shuffled else 0)
    try:
        schema = spark.read.parquet(d).schema
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(d)
        )
        base = src.select(
            "ts", "event_id", "user_id", F.expr(CENTS).alias("x"),
            F.expr(CENTS).alias("y"),
        )

        def state_fold(cols, ordered_fn, okind, **kw):
            s = base.select(*cols)
            if shuffled:
                return reordered_fold_stream(s, okind, delay=delay, **kw)
            return ordered_fn(s, **kw)
        if kind == "cusum":
            slack = rng.choice([0, 10, 50, 200])
            th = rng.choice([500, 1000, 2000, 5000])
            got = _finals(spark, state_fold(
                ["ts", "event_id", "user_id", "x"], cusum_fold_stream,
                "cusum", slack=slack, threshold=th,
            )).select("user_id", "smax", "n_over", "alarm", "n")
            want = _batch_cusum(df, slack, th)
            label = f"cusum(slack={slack},th={th})"
        elif kind == "ewma":
            w_old, w_new, den = rng.choice(
                [(7, 3, 10), (9, 1, 10), (1, 1, 2), (3, 1, 4)])
            got = _finals(spark, state_fold(
                ["ts", "event_id", "user_id", "x"], ewma_fold_stream,
                "ewma", w_old=w_old, w_new=w_new, den=den,
            )).select("user_id", "ew", "n")
            want = _batch_ewma(df, w_old, w_new, den)
            label = f"ewma({w_old},{w_new},{den})"
        elif kind == "rsi":
            period = rng.choice([3, 7, 14, 21])
            got = _finals(spark, state_fold(
                ["ts", "event_id", "user_id", "y"], rsi_fold_stream,
                "rsi", period=period,
            )).filter(F.col("n") >= 2).select(
                "user_id", (F.col("n") - 1).alias("n_diffs"), "ag", "al")
            want = _batch_rsi(df, period).select(
                "user_id", "n_diffs", "ag", "al")
            label = f"rsi(period={period})"
        elif kind == "ols":
            got = _finals(spark, state_fold(
                ["ts", "event_id", "user_id", "y"], ols_fold_stream,
                "ols",
            )).select("user_id", "n", "sy", "sxy", "syy")
            want = _batch_ols(df)
            label = "ols"
        elif kind == "bollinger":
            # per-ROW series (append mode emits each row once): compare
            # the whole rolling output, no final-row selection
            from async_stream_processing_spark.streaming.replay import (
                drain,
            )

            prev = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", "4")
            try:
                s = base.select("ts", "event_id", "user_id", "x")
                if shuffled:
                    raw = drain(reordered_bollinger_stream(s, delay=delay),
                                output_mode="append")
                    got = _max_nb(raw).select(
                        "user_id", "event_id", "n", "sx_c", "sxx_c4")
                else:
                    got = drain(
                        bollinger_fold_stream(s), output_mode="append",
                    ).select("user_id", "event_id", "n", "sx_c", "sxx_c4")
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", prev)
            want = _batch_bollinger(df, BOLLINGER_K).select(
                "user_id", "event_id", "n", "sx_c", "sxx_c4")
            label = f"bollinger(k={BOLLINGER_K})"
        elif kind == "corr":
            from async_stream_processing_spark.streaming.replay import (
                drain,
            )

            prev = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", "4")
            try:
                s = base.select("ts", "event_id", "user_id", "x")
                if shuffled:
                    raw = drain(reordered_corr_stream(s, delay=delay),
                                output_mode="append")
                    got = _max_nb(raw).select(
                        "user_id", "event_id", "n", "sx_c", "sy_c",
                        "sxy_c4", "sxx_c4", "syy_c4")
                else:
                    got = drain(
                        corr_fold_stream(s), output_mode="append",
                    ).select("user_id", "event_id", "n", "sx_c", "sy_c",
                             "sxy_c4", "sxx_c4", "syy_c4")
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", prev)
            want = _batch_corr(df, BOLLINGER_K).select(
                "user_id", "event_id", "n", "sx_c", "sy_c",
                "sxy_c4", "sxx_c4", "syy_c4")
            label = f"corr(k={BOLLINGER_K})"
        else:
            got = _finals(spark, state_fold(
                ["ts", "event_id", "user_id", "x"], drawdown_fold_stream,
                "drawdown",
            )).select("user_id", "eq", "peak", "dd", "n")
            want = _batch_drawdown(df)
            label = "drawdown"
        g = {tuple(r) for r in got.collect()}
        w = {tuple(r) for r in want.collect()}
        assert g == w, (
            f"{label} pred={pred_name} parts={n_parts}: "
            f"extra={list(g - w)[:3]} missing={list(w - g)[:3]}"
        )
        shape = "shuffled" if shuffled else "ordered"
        return (f"{label:24s} pred={pred_name:12s} parts={n_parts} "
                f"{shape:8s} keys={len(w)}")
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260816
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"

    from async_stream_processing_spark import get_spark

    spark = get_spark("foldfuzz", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0
    for i in range(n):
        rng = random.Random(seed + i)
        try:
            print("ok  ", run_case(spark, rng, sf_dir), flush=True)
        except AssertionError as e:
            failures += 1
            print(f"CASE {i} FAILED: {e}", flush=True)
    print(f"PASS: {n - failures}/{n} (stream folds, seed {seed})")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
