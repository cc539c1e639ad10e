"""Semantics tests for the analytic-breadth operators."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from async_stream_processing_spark.operators.analytics import (
    event_deltas,
    sessionize,
    sessionize_native,
    top_k_per_group,
)

T0 = datetime(2024, 1, 1)


def _events(spark, rows):
    return spark.createDataFrame(
        [(T0 + timedelta(seconds=s), i + 1, u, float(v)) for i, (s, u, v) in enumerate(rows)],
        "ts timestamp, seq long, user_id long, value double",
    )


def test_sessionize_gap_splits(spark):
    df = _events(spark, [
        (0, 1, 10), (60, 1, 20),       # session 1 (gap < 30 min)
        (60 * 60, 1, 30),              # session 2 (gap 59 min)
        (0, 2, 5),                     # user 2, one session
    ])
    out = {(r["user_id"], r["session_id"]): r for r in sessionize(df, gap_seconds=1800).collect()}
    assert len(out) == 3
    assert out[(1, 1)]["n_events"] == 2 and out[(1, 1)]["sum_value"] == 30.0
    assert out[(1, 2)]["n_events"] == 1
    assert out[(1, 1)]["session_end"] == T0 + timedelta(seconds=60 + 1800)


def test_sessionize_native_agrees_with_relational(spark):
    rows = [(s, u, v) for u in (1, 2, 3) for s, v in
            [(0, 1), (100, 2), (2000, 3), (2100, 4), (9000, 5)]]
    df = _events(spark, rows)
    a = {tuple(r) for r in sessionize(df, gap_seconds=1800).collect()}
    b = {tuple(r) for r in sessionize_native(df, gap_seconds=1800).collect()}
    assert a == b


def test_event_deltas_lag_lead(spark):
    df = _events(spark, [(0, 1, 5), (10, 1, 9), (25, 1, 7)])
    out = sorted(event_deltas(df, ["user_id"]).collect(), key=lambda r: r["seq"])
    assert out[0]["prev_ts"] is None and out[0]["next_ts"] == T0 + timedelta(seconds=10)
    assert out[1]["gap_us"] == 10_000_000
    assert [r["value_rank"] for r in out] == [3, 1, 2]


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("a", i, float(i % 5)) for i in range(20)], "g string, id long, v double"
    )
    out = top_k_per_group(df, ["g"], [F.desc("v"), F.asc("id")], k=2).collect()
    assert [(r["id"], r["v"]) for r in sorted(out, key=lambda r: r["rank"])] == [
        (4, 4.0), (9, 4.0)
    ]


def test_cardinality_sketch_tolerance(spark):
    """HLL approx within its error bound of the exact count."""
    import sys
    sys.path.insert(0, ".")
    import __spark_entry__ as m

    out = m.queries()["cardinality_sketch"](spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    for r in out:
        # the query emits the CONTRACT itself: booleans asserting the
        # estimator landed within 3x its configured rsd of exact
        assert r["exact_users"] > 0 and r["exact_values"] > 0
        assert r["users_within_rsd"] and r["values_within_rsd"]


def test_approx_equidepth_bounds_boundary_error(spark):
    """The approx (sketch) histogram's bucket boundaries must sit within
    the sketch's guaranteed rank error of the exact NTILE boundaries at
    sf0.1 (~600k lineitem rows): percentile_approx(accuracy=A) bounds
    relative rank error by 1/A.  We allow 2/A for boundary-tie slack,
    plus exact-equal totals and per-bucket counts within 1% of N/k."""
    from async_stream_processing_spark.operators.analytics import (
        approx_equidepth_histogram,
        equidepth_histogram,
    )
    from async_stream_processing_spark.sources.parquet import load_table

    sf_dir = "/root/testdata/sf0.1"
    k, acc = 10, 10_000
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    n = li.count()
    vals = [
        r[0]
        for r in li.orderBy("l_extendedprice").collect()
    ]  # test-only global sort for ground truth
    approx = {
        r["bucket"]: r
        for r in approx_equidepth_histogram(
            li, "l_extendedprice", k, acc
        ).collect()
    }
    exact = {
        r["bucket"]: r
        for r in equidepth_histogram(li, "l_extendedprice", k).collect()
    }
    assert sum(r["n_rows"] for r in approx.values()) == n
    # rank error of each approx interior boundary (hi of buckets 1..k-1)
    import bisect

    for i in range(1, k):
        b = approx[i]["hi"]
        lo_rank = bisect.bisect_left(vals, b)
        hi_rank = bisect.bisect_right(vals, b)
        target = i * n / k
        err = min(abs(lo_rank - target), abs(hi_rank - target)) / n
        assert err <= 2.0 / acc, (i, b, err)
    # equi-depth: every approx bucket within 1% of the ideal depth
    for i in range(1, k + 1):
        assert abs(approx[i]["n_rows"] - n / k) <= 0.01 * n, (
            i,
            approx[i]["n_rows"],
        )
    # and the exact form is perfectly balanced by construction
    assert {r["n_rows"] for r in exact.values()} <= {n // k, n // k + 1}


def _ticks(spark, rows):
    """rows: (seconds, user, value); event_id = arrival index."""
    return spark.createDataFrame(
        [
            (i + 1, T0 + timedelta(seconds=s), u, float(v))
            for i, (s, u, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )


def test_ohlc_bars_open_close_by_arrival_order(spark):
    from async_stream_processing_spark.operators.windows import ohlc_bars

    df = _ticks(spark, [
        (0, 1, 10.0), (30, 1, 50.0), (200, 1, 5.0), (299, 1, 20.0),  # bar 0
        (300, 1, 7.0),                                               # bar 1
        (10, 2, 3.0),                                                # user 2
    ])
    out = {
        (r["user_id"], r["bar_start"]): r
        for r in ohlc_bars(df, "5 minutes", ["user_id"]).collect()
    }
    b0 = out[(1, T0)]
    assert (b0["open"], b0["high"], b0["low"], b0["close"]) == (10.0, 50.0, 5.0, 20.0)
    assert b0["n_ticks"] == 4 and b0["sum_value"] == 85.0
    assert out[(1, T0 + timedelta(seconds=300))]["open"] == 7.0
    assert out[(2, T0)]["n_ticks"] == 1


def test_rolling_corr_matches_numpy_and_degenerates_to_null(spark):
    import math

    from async_stream_processing_spark.operators.windows import rolling_corr

    # user 1: noisy ramp (well-defined corr); user 2: constant (NULL)
    vals = [1.0, 3.0, 2.0, 5.0, 4.0, 7.0, 6.0, 9.0]
    rows = [(i, 1, v) for i, v in enumerate(vals)] + [
        (i, 2, 4.25) for i in range(4)
    ]
    out = rolling_corr(_ticks(spark, rows), ["user_id"], n_rows=4).collect()
    by_key = {(r["user_id"], r["event_id"]): r["corr4"] for r in out}
    # frame at the last event of user 1: x = vals[-4:], y = lag pairs
    x = vals[-4:]
    y = vals[-5:-1]
    n = len(x)
    sx, sy = sum(x), sum(y)
    sxy = sum(a * b for a, b in zip(x, y))
    sxx, syy = sum(a * a for a in x), sum(b * b for b in y)
    want = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert abs(by_key[(1, 8)] - want) < 1e-12
    # first row of every key has no lag pair -> NULL; constant series -> NULL
    assert by_key[(1, 1)] is None
    assert all(by_key[(2, e)] is None for e in range(9, 13))


def test_gap_fill_carries_last_value_across_gaps(spark):
    from async_stream_processing_spark.operators.windows import gap_fill

    df = _ticks(spark, [
        (0, 1, 10.0),            # hour 0
        (7200, 1, 30.0),         # hour 2 (hour 1 is a gap)
        (7260, 1, 40.0),         # later in hour 2: last_v by arrival
        (0, 2, 5.0),             # single-point key: 1-row grid
    ])
    out = {(r["user_id"], r["bucket_start"]): r
           for r in gap_fill(df, ["user_id"], every="1 hour").collect()}
    assert len(out) == 4  # user 1: hours 0..2; user 2: hour 0
    h0, h1, h2 = (out[(1, T0 + timedelta(hours=h))] for h in (0, 1, 2))
    assert (h0["n_obs"], h0["value_ffill"]) == (1, 10.0)
    assert (h1["n_obs"], h1["value_ffill"]) == (0, 10.0)  # gap: carried
    assert (h2["n_obs"], h2["value_ffill"]) == (2, 40.0)  # last by arrival
    assert out[(2, T0)]["n_obs"] == 1


def test_ols_trend_matches_numpy_least_squares(spark):
    """The normal-equation closed form must agree with numpy's lstsq on
    a small keyed fixture (to float tolerance), including an r2=NULL
    constant-y key and the min_points gate."""
    from datetime import datetime, timedelta

    import numpy as np

    from async_stream_processing_spark.operators.analytics import ols_trend

    t0 = datetime(2024, 1, 1)
    rows, ys = [], {1: [], 2: []}
    rng = [3.25, 7.5, 1.0, 9.75, 2.5, 8.0, 4.25, 6.5, 0.75, 5.0, 9.0, 2.25]
    eid = 0
    for k in (1, 2):
        for i, v in enumerate(rng):
            y = v * k + (i * 0.5 if k == 1 else 0.0)
            rows.append((eid, t0 + timedelta(seconds=i), k, y))
            ys[k].append(y)
            eid += 1
    # key 3: constant y -> den_y == 0 -> r2 NULL
    for i in range(12):
        rows.append((eid, t0 + timedelta(seconds=i), 3, 5.0))
        eid += 1
    # key 4: below min_points -> filtered out
    rows.append((eid, t0, 4, 1.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    out = {r["user_id"]: r for r in ols_trend(df, min_points=10).collect()}
    assert set(out) == {1, 2, 3}
    for k in (1, 2):
        y = np.array([round(v * 100) for v in ys[k]], dtype=float)
        x = np.arange(1, len(y) + 1, dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(out[k]["slope_cents"] - slope) < 1e-6 * max(1, abs(slope))
        assert abs(out[k]["intercept_cents"] - intercept) \
            < 1e-6 * max(1, abs(intercept))
        r = np.corrcoef(x, y)[0, 1]
        assert abs(out[k]["r2"] - r * r) < 1e-9
    assert out[3]["r2"] is None and out[3]["slope_cents"] == 0.0


def test_ols_trend_single_exchange(spark):
    """The window and the groupBy share the user_id partitioning: the
    whole plan carries exactly ONE shuffle."""
    from async_stream_processing_spark.operators.analytics import ols_trend
    from async_stream_processing_spark.sources.parquet import load_table

    df = ols_trend(load_table(spark, "/root/testdata/sf0.001", "events"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_mad_outliers_brute_force_and_degeneracy(spark):
    """The doubled-median construction equals a numpy median/MAD brute
    force (odd AND even group sizes), and the mad4=0 degenerate group
    flags exactly the rows that deviate at all."""
    from datetime import datetime, timedelta

    import numpy as np

    from async_stream_processing_spark.operators.analytics import (
        mad_outliers,
    )

    t0 = datetime(2024, 1, 1)
    vals = {
        1: [1.0, 1.1, 0.9, 1.05, 1.2, 0.95, 1.0, 1.15, 0.85, 99.0, 1.0],
        2: [2.0, 2.1, 1.9, 2.05, 2.2, 1.95, 2.0, 2.15, 1.85, 50.0],
        3: [5.0] * 11 + [7.0],  # mad = 0: any deviation flags
    }
    rows, eid = [], 0
    for k, vs in vals.items():
        for i, v in enumerate(vs):
            rows.append((eid, t0 + timedelta(seconds=i), k, v))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = mad_outliers(df, k_num=3, min_points=10).collect()
    by_key = {}
    for r in got:
        by_key.setdefault(r["user_id"], set()).add(r["y_c"])
    for k in (1, 2):
        y = np.array([round(v * 100) for v in vals[k]])
        med = np.median(y)
        mad = np.median(np.abs(y - med))
        expect = {int(v) for v in y if abs(v - med) > 3 * mad}
        assert by_key.get(k, set()) == expect, k
    assert by_key[3] == {700}


def test_rsi_users_brute_force_recurrence(spark):
    """The two independent Wilder folds equal a Python reference of the
    same recurrence (scaled-integer, truncating div), including the
    all-gains degenerate key (rsi = 100)."""
    from datetime import datetime, timedelta

    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as m

    t0 = datetime(2024, 1, 1)
    vals = {
        1: [10.0, 10.5, 10.2, 10.8, 10.1, 10.9, 10.3, 11.0, 10.4,
            11.1, 10.5, 11.2, 10.6, 11.3, 10.7],   # 14 diffs mixed
        2: [float(i) for i in range(1, 17)],        # all gains -> 100
    }
    rows, eid = [], 0
    for k, vs in vals.items():
        for i, v in enumerate(vs):
            rows.append((eid, t0 + timedelta(seconds=i), k, v))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    import tempfile

    d = tempfile.mkdtemp()
    import pyarrow.parquet as pq
    from pyarrow import Table

    pq.write_table(
        Table.from_pandas(df.toPandas()), f"{d}/events.parquet"
    )
    out = {r["user_id"]: r for r in m.queries()["rsi_users"](
        spark, d).collect()}

    def wilder(xs):
        a = xs[0]
        for v in xs[1:]:
            t = a * 13 + v
            a = t // 14  # nonnegative: floor == trunc
        return a

    for k, vs in vals.items():
        cents = [round(v * 100) for v in vs]
        diffs = [b - a for a, b in zip(cents, cents[1:])]
        g = [max(x, 0) * 1_000_000 for x in diffs]
        l = [max(-x, 0) * 1_000_000 for x in diffs]
        ag, al = wilder(g), wilder(l)
        assert out[k]["ag_scaled"] == ag and out[k]["al_scaled"] == al, k
        want = 100.0 * ag / (ag + al)
        assert abs(out[k]["rsi"] - want) < 1e-12
    assert out[2]["rsi"] == 100.0


def test_cusum_closed_form_equals_naive_recurrence(spark):
    """The reflected-walk closed form (cumsum - min(0, running min))
    must equal the literal s_t = max(0, s_{t-1} + y_t) recurrence on a
    fixture with sign changes, resets and an alarm crossing."""
    from datetime import datetime, timezone

    from async_stream_processing_spark.operators.analytics import (
        cusum_drift,
    )

    vals = [10.0, 9.0, 15.0, 30.0, 5.0, 40.0, 45.0, 50.0, 2.0, 60.0,
            70.0, 80.0]
    rows = [
        ("u1", datetime(2024, 1, 1, 0, 0, i, tzinfo=timezone.utc), i, v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long, value double"
    )
    got = cusum_drift(
        df, slack_cents=100, threshold_cents=3000, min_points=1
    ).collect()
    assert len(got) == 1
    r = got[0]

    # naive recurrence in integer cents
    cents = [int(v * 100) for v in vals]
    x1, s, smax, n_over, alarm = cents[0], 0, 0, 0, None
    for eid, x in enumerate(cents):
        s = max(0, s + (x - x1 - 100))
        smax = max(smax, s)
        if s > 3000:
            n_over += 1
            alarm = eid if alarm is None else min(alarm, eid)
    assert r["max_cusum"] == smax
    assert r["n_over"] == n_over
    assert r["first_alarm_event"] == alarm
    assert r["n_points"] == len(vals)


# ---------------------------------------------------------------- seasonal


def _daily_events(spark, days, per_day=2, skip=()):
    """per_day events on each of `days` consecutive days from T0,
    values day*1.0 and day*1.0+0.5, skipping day indices in `skip`."""
    rows = []
    seq = 0
    for d in range(days):
        if d in skip:
            continue
        for j in range(per_day):
            seq += 1
            rows.append(
                (T0 + timedelta(days=d, hours=j + 1), seq, 1, d + j * 0.5)
            )
    return spark.createDataFrame(
        rows, "ts timestamp, seq long, user_id long, value double"
    )


def test_seasonal_decompose_matches_hand_computation(spark):
    from async_stream_processing_spark.operators.analytics import (
        seasonal_decompose_daily,
    )

    days = 21
    df = _daily_events(spark, days)
    out = {r["day"]: r for r in
           seasonal_decompose_daily(df, ts="ts", value="value").collect()}
    assert len(out) == days
    totals = {d: 2 * d + 0.5 for d in range(days)}  # d + (d+0.5)

    def day_key(d):
        return (T0 + timedelta(days=d)).strftime("%Y-%m-%d")

    # trend: centered 7-day mean on interior days, NULL on the 3 edges
    for d in range(days):
        r = out[day_key(d)]
        assert abs(r["total"] - totals[d]) < 1e-9
        if 3 <= d <= days - 4:
            exp = sum(totals[k] for k in range(d - 3, d + 4)) / 7.0
            assert abs(r["trend"] - exp) < 1e-9
            assert abs(r["total"] - r["trend"] - r["seasonal"]
                       - r["residual"]) < 1e-12
        else:
            assert r["trend"] is None and r["residual"] is None
    # seasonal: per-phase mean of detrended over full-window days
    import collections
    det = collections.defaultdict(list)
    epoch_off = (T0.date() - __import__("datetime").date(1970, 1, 1)).days
    for d in range(3, days - 3):
        exp_t = sum(totals[k] for k in range(d - 3, d + 4)) / 7.0
        det[(epoch_off + d) % 7].append(totals[d] - exp_t)
    for d in range(days):
        ph = (epoch_off + d) % 7
        assert out[day_key(d)]["phase"] == ph
        exp_s = sum(det[ph]) / len(det[ph])
        assert abs(out[day_key(d)]["seasonal"] - exp_s) < 1e-9


def test_seasonal_decompose_range_frame_is_gap_safe(spark):
    """A missing day must shrink the centered window (RANGE frame over
    day index), not silently widen it as a ROWS frame would -- trend is
    NULL within 3 days of the gap."""
    from async_stream_processing_spark.operators.analytics import (
        seasonal_decompose_daily,
    )

    days = 15
    df = _daily_events(spark, days, skip={7})
    out = {r["day"]: r for r in
           seasonal_decompose_daily(df, ts="ts", value="value").collect()}
    assert len(out) == days - 1

    def day_key(d):
        return (T0 + timedelta(days=d)).strftime("%Y-%m-%d")

    for d in (4, 5, 6, 8, 9, 10):  # within 3 of the missing day 7
        assert out[day_key(d)]["trend"] is None
    assert out[day_key(3)]["trend"] is not None
    assert out[day_key(11)]["trend"] is not None


# ------------------------------------------------------------- scd2 joins


def test_scd2_intervals_partition_each_keys_timeline(spark):
    """Every event joins to EXACTLY ONE version interval under the
    temporal predicate the streaming gate uses."""
    from async_stream_processing_spark.operators.analytics import (
        scd2_intervals,
    )

    rows, seq = [], 0
    for u in (1, 2):
        for i, attr in enumerate("aabbaacc"):
            seq += 1
            rows.append((T0 + timedelta(minutes=i), seq, u, attr))
    df = spark.createDataFrame(
        rows, "ts timestamp, seq long, user_id long, attr string"
    )
    dim = scd2_intervals(df, key="user_id", attr="attr", ts="ts", seq="seq")
    matched = df.alias("e").join(
        dim.alias("s"),
        (F.col("e.user_id") == F.col("s.user_id"))
        & (F.col("e.ts") >= F.col("s.valid_from"))
        & (F.col("s.valid_to").isNull()
           | (F.col("e.ts") < F.col("s.valid_to"))),
    )
    assert matched.count() == df.count()  # exactly-one: counts equal
    per_event = matched.groupBy("e.seq").count()
    assert per_event.filter(F.col("count") != 1).count() == 0
    # attribution: each event's matched attr is its own (runs derive
    # from the same log)
    assert matched.filter(F.col("e.attr") != F.col("s.attr")).count() == 0
    # version runs: user 1 has 4 runs (a,b,a,c)
    assert dim.filter(F.col("user_id") == 1).count() == 4


def test_seasonal_decompose_differential_random_params(spark):
    """Randomized cross-engine differential for the seasonal float
    discipline: random (period, trend_window, predicate) configs must
    be BIT-IDENTICAL between the Spark operator and the DuckDB SQL
    template (sql_seasonal_decompose) they both derive from -- the
    parameter axis the single gate config cannot cover."""
    import math
    import random

    import duckdb

    from async_stream_processing_spark.operators.analytics import (
        seasonal_decompose_daily,
        sql_seasonal_decompose,
    )
    from async_stream_processing_spark.sources.parquet import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
    )
    rng = random.Random(20260817333)
    preds = [
        ("all", None, ""),
        ("mod", F.col("user_id") % 3 == 0, "WHERE user_id % 3 = 0"),
        ("type", F.col("event_type") == "click",
         "WHERE event_type = 'click'"),
    ]
    for _ in range(8):
        period = rng.choice([3, 5, 7, 9])
        window = rng.choice([3, 5, 7, 9])
        name, pf, psql = preds[rng.randrange(len(preds))]
        src = ev if pf is None else ev.filter(pf)
        got = seasonal_decompose_daily(
            src, ts="ts", value="value", period=period, trend_window=window
        ).collect()
        sql = sql_seasonal_decompose(
            f"(SELECT * FROM events {psql})", period=period,
            trend_window=window,
        )
        want = con.execute(sql).df().to_dict("records")
        gm = {r["day"]: r for r in got}
        assert len(gm) == len(want), (period, window, name)
        for w in want:
            g = gm[w["day"]]
            for c in ("phase", "n_events", "total", "trend", "seasonal",
                      "residual"):
                a, b = g[c], w[c]
                both_null = (a is None and
                             (b is None or (isinstance(b, float)
                                            and math.isnan(b))))
                assert both_null or a == b, (
                    period, window, name, w["day"], c, a, b,
                )
