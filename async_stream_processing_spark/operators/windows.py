"""Time-window operators: sliding weighted means (VWAP) and resampling.

Reference semantics ported here:

* ``MovingAverage`` (``/root/reference/examples/csp/02_intermediate/e2_stats.py:35-65``)
  keeps a ``(event_time, value, weight)`` buffer, prunes rows older than
  ``t - interval`` on insert, and answers ``sum(v*w)/sum(w)`` -- i.e. a
  **time-range sliding window weighted mean** evaluated at every event.
* The 1-minute sampling ``timer`` (e2_stats.py:73-96) that also prints the
  cumulative volume maps to a tumbling-window aggregation (resample).

Spark disposition: the buffer *is* a window frame --
``Window.orderBy(ts).rangeBetween(-interval, 0)`` -- so state management,
pruning and spilling are the engine's problem, not ours.  At scale, a global
``orderBy`` window serializes; partition by a stream key whenever the query
has one (the reference's buffers are per-instrument too).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import dec
from ..plans.event_relation import TS


def _range_window(partition_by: list[str], seconds: int, order_col: str | None = None):
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    # RANGE frame over epoch-MICROseconds (full timestamp precision; the
    # reference prunes on raw datetimes, e2_stats.py:63-65).  Peers with
    # equal ts share a frame in both Spark and ANSI SQL, so tie-stable.
    # Passing a materialized ``order_col`` lets downstream windows ordering
    # by (order_col, ...) reuse this window's sort (same attribute id).
    order = F.col(order_col) if order_col else F.unix_micros("ts")
    return w.orderBy(order).rangeBetween(-seconds * 1_000_000, 0)


def sliding_weighted_mean(
    df: DataFrame,
    value: str = "value",
    weight: str | Column | None = None,
    interval_seconds: int = 120,
    partition_by: list[str] | None = None,
    out: str = "wmean",
    value_scale: int = 2,
    weight_scale: int = 0,
    order_col: str | None = None,
) -> DataFrame:
    """Per-event ``sum(v*w)/sum(w)`` over the trailing ``interval_seconds``.

    ``weight=None`` degenerates to the plain sliding mean.  Sums are decimal
    (order-independent) per ``functions.numeric``; pass the columns' true
    scales so totals stay within double-exact range (numeric.py rule).
    """
    partition_by = partition_by or []
    w = _range_window(partition_by, interval_seconds, order_col)
    v = F.col(value)
    if weight is None:
        num = F.sum(dec(v, value_scale)).over(w).cast("double")
        den = F.count(v).over(w).cast("double")
    else:
        # decimal x decimal product of SOURCE columns -- exact and
        # DuckDB-portable (see functions.numeric module rule).
        wt = F.col(weight) if isinstance(weight, str) else weight
        num = F.sum(dec(v, value_scale) * dec(wt, weight_scale)).over(w).cast("double")
        den = F.sum(dec(wt, weight_scale)).over(w).cast("double")
    return df.withColumn(out, num / den)


def cumulative_sum(
    df: DataFrame,
    value: str = "value",
    order: list[str | Column] = ("ts", "seq"),
    partition_by: list[str] | None = None,
    out: str = "cum_sum",
    scale: int = 6,
) -> DataFrame:
    """Running total in the reference's strict event order (SURVEY §3.4).

    Mirrors the cumulative-volume accumulator of e2_stats.py:87-96 and the
    ``accum`` of e2_ticking.py:10-27.  ``order`` accepts Columns so a
    caller stacking this on a range-frame window can share its sort key
    (e.g. ``[F.unix_micros("ts"), "seq"]`` -- Spark then elides the second
    per-partition sort because the first's key is a prefix).
    """
    base = Window.partitionBy(*(partition_by or []))
    keys = [F.col(c) if isinstance(c, str) else c for c in order]
    w = base.orderBy(*keys).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out, F.sum(dec(value, scale)).over(w).cast("double"))


def resample(
    df: DataFrame,
    every: str = "1 minute",
    aggs: dict[str, Column] | None = None,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window aggregation (the reference's periodic sampling timer,
    processor.py:140-150 driving e2_stats.py:91-96).

    Emits one row per non-empty bucket keyed by ``bucket_start`` (we use
    ``date_trunc`` rather than ``window()`` so the schema is a plain
    timestamp, directly comparable to an ANSI-SQL oracle).  Works unchanged
    as a streaming aggregation when fed a streaming DataFrame with a
    watermark (swap date_trunc for ``window()`` there -- see streaming/).
    """
    qty_s, unit = every.split()
    qty = int(qty_s)
    unit = unit.rstrip("s")  # "1 minute" -> "minute"
    if qty == 1:
        bucket = F.date_trunc(unit, F.col("ts"))
    else:
        step_us = qty * {"second": 10**6, "minute": 60 * 10**6,
                         "hour": 3600 * 10**6, "day": 86400 * 10**6}[unit]
        bucket = F.timestamp_micros(
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts")) % step_us)
        )
    keys = [bucket.alias("bucket_start")] + [F.col(c) for c in (partition_by or [])]
    aggs = aggs or {"n_events": F.count(F.lit(1))}
    return df.groupBy(*keys).agg(*[v.alias(k) for k, v in aggs.items()])


def ohlc_bars(
    df: DataFrame,
    every: str = "5 minutes",
    partition_by: list[str] | None = None,
    value: str = "value",
    order: str = "event_id",
    scale: int = 6,
) -> DataFrame:
    """Candlestick (OHLCV) bars: per key and tumbling bucket, the first /
    max / min / last value plus count and exact sum -- the time-series
    downsampling every market-data consumer of the reference's tick
    streams (e6_market_data adapter shape) runs first.

    open/close use ``min_by``/``max_by`` over the total-order column
    (``event_id`` -- unique, assigned in ts order by the generator;
    functions/../plans/event_relation.py), so ties are impossible and
    the oracle's ``arg_min``/``arg_max`` reproduce them exactly.  ONE
    hash aggregation, map-side combined: O(bars) state, no window, no
    sort -- the 100 TB shape.  ``sum_value`` follows the decimal-space
    rule (functions/numeric.py).
    """
    qty_s, unit = every.split()
    qty, unit = int(qty_s), unit.rstrip("s")
    step_us = qty * {"second": 10**6, "minute": 60 * 10**6,
                     "hour": 3600 * 10**6, "day": 86400 * 10**6}[unit]
    bucket = F.timestamp_micros(
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts")) % step_us
    )
    keys = [F.col(c) for c in (partition_by or [])] + [
        bucket.alias("bar_start")
    ]
    return df.groupBy(*keys).agg(
        F.min_by(F.col(value), F.col(order)).alias("open"),
        F.max(value).alias("high"),
        F.min(value).alias("low"),
        F.max_by(F.col(value), F.col(order)).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
        F.sum(dec(value, scale)).cast("double").alias("sum_value"),
    )


def rolling_corr(
    df: DataFrame,
    partition_by: list[str],
    n_rows: int = 20,
    value: str = "value",
    order: tuple[str, ...] = ("ts", "event_id"),
    scale: int = 2,
) -> DataFrame:
    """Rolling Pearson autocorrelation (lag 1) of ``value`` over the last
    ``n_rows`` events per key -- the momentum / mean-reversion signal of
    a tick pipeline, and the repo's template for any rolling second-
    moment statistic (covariance, beta, zscore share the same sums).

    Exactness discipline (functions/numeric.py): the five frame sums
    (n, Sx, Sy, Sxy, Sxx, Syy) are DECIMAL-space -- order-independent,
    partitioning-independent -- then cast to double once, and the final
    Pearson formula is a FIXED tree of IEEE +,-,*,/,sqrt on those
    doubles (every op correctly rounded, so bit-identical in any
    engine; only libm transcendentals are non-portable, and there are
    none here).  Degenerate frames (constant series: zero variance)
    yield NULL via an integer-free double guard identical in the
    oracle.  ONE window over (key) x (ts, order): all six sums share a
    single exchange + sort; state is the n_rows frame -- bounded,
    spillable, no global sort.

    ``scale`` must be the column's TRUE decimal scale (default 2:
    currency-like data): the quadratic sums carry 2*scale fractional
    digits, and the decimal->double cast is only exact while
    ``|sum| * 10^(2*scale) < 2^53`` (numeric.py rule 2) -- scale 6
    would silently break bit-portability on cent-precision data.
    """
    x = dec(value, scale)
    w_lag = Window.partitionBy(*partition_by).orderBy(
        *[F.col(c) for c in order]
    )
    lagged = df.withColumn("__y", F.lag(x, 1).over(w_lag))
    w = w_lag.rowsBetween(-(n_rows - 1), 0)
    xx = x * x
    yy = F.col("__y") * F.col("__y")
    xy = x * F.col("__y")
    n = F.count("__y").over(w).cast("double")
    sx = F.sum(F.when(F.col("__y").isNotNull(), x)).over(w).cast("double")
    sy = F.sum("__y").over(w).cast("double")
    sxy = F.sum(xy).over(w).cast("double")
    sxx = F.sum(F.when(F.col("__y").isNotNull(), xx)).over(w).cast("double")
    syy = F.sum(yy).over(w).cast("double")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    corr = F.when(
        (vx > 0) & (vy > 0),
        (n * sxy - sx * sy) / F.sqrt(vx * vy),
    )
    out = lagged.select(
        *[F.col(c) for c in partition_by],
        "ts",
        F.col("event_id"),
        corr.alias(f"corr{n_rows}"),
    )
    return out


def gap_fill(
    df: DataFrame,
    partition_by: list[str],
    every: str = "1 hour",
    value: str = "value",
    order: str = "event_id",
) -> DataFrame:
    """Regular-grid resampling WITH gap filling: one row per key per
    bucket from the key's first to last observation, carrying the last
    observed value forward across empty buckets (n_obs = 0) -- the
    time-grid interpolation step (the reference's ``testing.timestamps``
    grid, sources/synthetic.py) every downstream feature join wants.

    Shape: observations collapse to per-bucket last-value/count first
    (map-side-combined aggregation -- the corpus-sized pass), the grid
    is GENERATE-side (``sequence`` over each key's [lo, hi] bucket
    bounds: grid rows are never shuffled in), and the forward fill is
    one ``last(ignorenulls)`` window per key over the grid -- state is
    a single value, the frame never re-sorts observations.  Grid volume
    is keys x span/step: pick ``every`` so that product stays sane (an
    hourly grid over months is fine; a 1-second grid over years is a
    data bug, not an engine problem)."""
    qty_s, unit = every.split()
    qty, unit = int(qty_s), unit.rstrip("s")
    step_us = qty * {"second": 10**6, "minute": 60 * 10**6,
                     "hour": 3600 * 10**6, "day": 86400 * 10**6}[unit]
    bucket = F.timestamp_micros(
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts")) % step_us
    )
    keys = [F.col(c) for c in partition_by]
    obs = df.groupBy(*keys, bucket.alias("b")).agg(
        F.max_by(F.col(value), F.col(order)).alias("last_v"),
        F.count(F.lit(1)).alias("n"),
    )
    bounds = obs.groupBy(*keys).agg(
        F.min("b").alias("lo"), F.max("b").alias("hi")
    )
    grid = bounds.select(
        *keys,
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr(f"interval {every}"))
        ).alias("bucket_start"),
    )
    joined = grid.join(
        obs,
        [grid[c] == obs[c] for c in partition_by]
        + [grid["bucket_start"] == obs["b"]],
        "left",
    ).select(
        *[grid[c] for c in partition_by], "bucket_start", "last_v", "n"
    )
    w = (
        Window.partitionBy(*partition_by)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        *partition_by,
        "bucket_start",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_obs"),
        F.last("last_v", ignorenulls=True).over(w).alias("value_ffill"),
    )


def max_drawdown(
    df: DataFrame,
    partition_by: list[str],
    value: str = "value",
    order: tuple[str, ...] = ("ts", "event_id"),
    scale: int = 2,
) -> DataFrame:
    """Maximum drawdown per key: treat ``value`` as per-event P&L, build
    the cumulative equity curve, track its running peak, and report the
    deepest peak-to-trough fall -- the risk statistic every backtest
    prints next to total return (reference's running aggregates:
    e2_stats.py cumulative volume is the same fold family).

    Exactness: equity, peak and drawdown stay in DECIMAL space (the
    running sums are order-independent given the total (ts, order)
    order), cast to double ONCE at the output -- same discipline as
    :func:`rolling_corr`.  ONE window (two frames sharing one exchange +
    sort) + one final aggregation; state per key is O(1).
    """
    x = dec(value, scale)
    w = Window.partitionBy(*partition_by).orderBy(
        *[F.col(c) for c in order]
    ).rowsBetween(Window.unboundedPreceding, 0)
    equity = F.sum(x).over(w)
    curve = df.select(
        *[F.col(c) for c in partition_by],
        x.alias("__x"),
        equity.alias("__eq"),
        (F.max(equity).over(w) - equity).alias("__dd"),
    )
    # final equity == the cumulative sum at the key's last row == the
    # key's total (order-free DECIMAL sum) -- no order-sensitive last()
    return curve.groupBy(*partition_by).agg(
        F.max("__dd").cast("double").alias("max_drawdown"),
        F.max("__eq").cast("double").alias("peak_equity"),
        F.sum("__x").cast("double").alias("final_equity"),
        F.count(F.lit(1)).alias("n_events"),
    )


def sql_max_drawdown(src: str = "events", key: str = "user_id") -> str:
    """DuckDB twin of :func:`max_drawdown` over ``events``."""
    return f"""
        WITH eqc AS (
            SELECT {key}, ts, event_id,
                   CAST(value AS DECIMAL(18,2)) AS x,
                   SUM(CAST(value AS DECIMAL(18,2))) OVER w AS eq
            FROM {src}
            WINDOW w AS (PARTITION BY {key} ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        curve AS (
            SELECT {key}, x, eq, MAX(eq) OVER w2 - eq AS dd
            FROM eqc
            WINDOW w2 AS (PARTITION BY {key} ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT {key},
               CAST(MAX(dd) AS DOUBLE) AS max_drawdown,
               CAST(MAX(eq) AS DOUBLE) AS peak_equity,
               CAST(SUM(x) AS DOUBLE) AS final_equity,
               COUNT(*) AS n_events
        FROM curve GROUP BY {key}
    """


def bollinger_bands(
    df: DataFrame,
    partition_by: list[str],
    n_rows: int = 20,
    n_sigma: int = 2,
    value: str = "value",
    order: tuple[str, ...] = ("ts", "event_id"),
    scale: int = 2,
) -> DataFrame:
    """Bollinger bands: rolling ``n_rows``-row mean ± ``n_sigma``
    population standard deviations per key -- the volatility envelope,
    sharing :func:`rolling_corr`'s exactness discipline: integer-exact
    DECIMAL frame sums (Sx, Sxx, n), ONE cast to double each, then a
    fixed IEEE tree (+,-,*,/,sqrt are all correctly rounded; no libm).
    Zero-variance frames pin both bands to the mean via a double guard
    identical in the oracle.  ONE window; bounded frame state.
    """
    x = dec(value, scale)
    w = Window.partitionBy(*partition_by).orderBy(
        *[F.col(c) for c in order]
    ).rowsBetween(-(n_rows - 1), 0)
    n = F.count(F.lit(1)).over(w).cast("double")
    sx = F.sum(x).over(w).cast("double")
    sxx = F.sum(x * x).over(w).cast("double")
    mean = sx / n
    var = (n * sxx - sx * sx) / (n * n)
    band = F.when(var > 0, F.lit(float(n_sigma)) * F.sqrt(var)).otherwise(
        F.lit(0.0)
    )
    return df.select(
        *[F.col(c) for c in partition_by],
        "ts",
        "event_id",
        mean.alias("mid"),
        (mean + band).alias("upper"),
        (mean - band).alias("lower"),
    )


def sql_bollinger_bands(
    src: str = "events",
    key: str = "user_id",
    n_rows: int = 20,
    n_sigma: int = 2,
) -> str:
    """DuckDB twin of :func:`bollinger_bands`."""
    return f"""
        WITH sums AS (
            SELECT {key}, ts, event_id,
                   CAST(COUNT(*) OVER w AS DOUBLE) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w
                        AS DOUBLE) AS sx,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))
                            * CAST(value AS DECIMAL(18,2))) OVER w
                        AS DOUBLE) AS sxx
            FROM {src}
            WINDOW w AS (PARTITION BY {key} ORDER BY ts, event_id
                         ROWS BETWEEN {n_rows - 1} PRECEDING
                         AND CURRENT ROW))
        SELECT {key}, ts, event_id,
               sx / n AS mid,
               sx / n + (CASE WHEN (n * sxx - sx * sx) / (n * n) > 0
                              THEN {n_sigma}.0 * sqrt((n * sxx - sx * sx)
                                                      / (n * n))
                              ELSE 0.0 END) AS upper,
               sx / n - (CASE WHEN (n * sxx - sx * sx) / (n * n) > 0
                              THEN {n_sigma}.0 * sqrt((n * sxx - sx * sx)
                                                      / (n * n))
                              ELSE 0.0 END) AS lower
        FROM sums
    """


def rsi_wilder(df: DataFrame, key: str = "user_id",
               value: str = "value", period: int = 14,
               min_diffs: int = 14) -> DataFrame:
    """Wilder RSI per key (recursive-seed dialect): ordered value diffs
    split into gains/losses, each smoothed by the Wilder recurrence
    ``a' = ((period-1)*a + x) div period`` as an INDEPENDENT keyed
    ordered fold over exact scaled integers (the ewma_users
    discipline; all terms nonnegative, so DuckDB ``//`` floor equals
    Spark ``div`` truncation), then RSI = 100*AG/(AG+AL) as one fixed
    IEEE tree.  Classic RSI seeds with the SMA of the first ``period``
    diffs; this variant seeds with the first diff (pure recurrence —
    documented dialect, same fixpoint).  One shuffle: the lag window
    and the fold share the key partition."""
    y = (F.col(value).cast("decimal(18,2)") * 100).cast("long")
    w = Window.partitionBy(key).orderBy(TS, "event_id")
    d = (
        df.select(key, TS, "event_id", y.alias("y"))
        .withColumn("diff", F.col("y") - F.lag("y").over(w))
        .filter(F.col("diff").isNotNull())
        .select(
            key, TS, "event_id",
            (F.greatest("diff", F.lit(0)) * 1_000_000).alias("g"),
            (F.greatest(-F.col("diff"), F.lit(0)) * 1_000_000).alias("l"),
        )
    )
    arr = F.array_sort(F.collect_list(F.struct(TS, "event_id", "g", "l")))
    agg = (
        d.groupBy(key).agg(arr.alias("arr"))
        .filter(F.size("arr") >= min_diffs)
    )

    def wilder(xs):
        def step(acc, v):
            t = acc * (period - 1) + v
            # (t - t%period)/period: exact multiple below 2^53, so the
            # double division is exact (the ewma_users trick)
            return ((t - t % period) / period).cast("long")

        return F.aggregate(
            F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))),
            F.element_at(xs, 1),
            step,
        )

    agg = agg.select(
        key,
        F.size("arr").cast("long").alias("n_diffs"),
        wilder(F.transform(F.col("arr"), lambda a: a["g"]))
        .alias("ag_scaled"),
        wilder(F.transform(F.col("arr"), lambda a: a["l"]))
        .alias("al_scaled"),
    )
    ag_d = F.col("ag_scaled").cast("double")
    al_d = F.col("al_scaled").cast("double")
    return agg.withColumn(
        "rsi",
        F.when(
            F.col("ag_scaled") + F.col("al_scaled") > 0,
            F.lit(100.0) * ag_d / (ag_d + al_d),
        ),
    )
