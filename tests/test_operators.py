"""Operator semantics tests mirroring the reference's test scenarios
(``/root/reference/tests/test_past.py``) as *exact* event-time assertions --
we drop the reference's 1 ms processing-time tolerance because our results
are pure event-time (SURVEY §5).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from async_stream_processing_spark.operators.asof import asof_join
from async_stream_processing_spark.operators.dedup import first_seen, mark_first_seen
from async_stream_processing_spark.operators.feedback import feedback_orders
from async_stream_processing_spark.operators.merge import last_value_merge, positional_zip
from async_stream_processing_spark.operators.running import running_combine, spread
from async_stream_processing_spark.operators.session_state import cart_fold
from async_stream_processing_spark.operators.windows import sliding_weighted_mean
from async_stream_processing_spark.sources.synthetic import timer_ticks, timestamps

T0 = datetime(2024, 1, 1)


def _ts(seconds: float) -> datetime:
    return T0 + timedelta(seconds=seconds)


def _stream(spark, rows, stream_id=0):
    """rows: list of (seconds_offset, value) -> event relation."""
    return spark.createDataFrame(
        [(_ts(s), (stream_id << 40) + i + 1, float(v)) for i, (s, v) in enumerate(rows)],
        "ts timestamp, seq long, value double",
    )


def test_timer_fires_exactly_n_times(spark):
    """Reference contract: 10 s window, 1 s step -> exactly 10 firings,
    first at start+step, end inclusive (tests/test_past.py:104-119)."""
    out = timer_ticks(spark, T0, _ts(10), step="1 second").collect()
    assert len(out) == 10
    assert out[0]["tick_ts"] == _ts(1)
    assert out[-1]["tick_ts"] == _ts(10)


def test_timestamps_evenly_spaced(spark):
    """testing.timestamps analog (testing.py:6-10)."""
    out = timestamps(spark, T0, "2 seconds", 5).collect()
    assert [r["ts"] for r in out] == [_ts(0), _ts(2), _ts(4), _ts(6), _ts(8)]


def test_first_seen_greeter(spark):
    """Greeter: hello on first occurrence, hello-again after (common.py:25-34)."""
    df = spark.createDataFrame(
        [(_ts(1), 1, "ann"), (_ts(2), 2, "bob"), (_ts(3), 3, "ann")],
        "ts timestamp, seq long, name string",
    )
    firsts = {r["name"]: r["ts"] for r in first_seen(df, "name").collect()}
    assert firsts == {"ann": _ts(1), "bob": _ts(2)}
    marked = {(r["name"], r["seq"]): r["is_first"]
              for r in mark_first_seen(df, "name").collect()}
    assert marked == {("ann", 1): True, ("bob", 2): True, ("ann", 3): False}


def test_positional_zip_stops_at_shortest(spark):
    """merge_timeseries zips by position, keeps series-1 timestamps,
    truncates to the shortest input (common.py:18-22; SURVEY B2)."""
    x = _stream(spark, [(0, 10), (5, 11), (9, 12)], stream_id=0)
    y = _stream(spark, [(1, 20), (2, 21)], stream_id=1)
    out = positional_zip({"x": x, "y": y}).orderBy("rn").collect()
    assert [(r["rn"], r["ts"], r["x"], r["y"]) for r in out] == [
        (1, _ts(0), 10.0, 20.0),
        (2, _ts(5), 11.0, 21.0),
    ]


def test_last_value_merge_carry_forward(spark):
    """The intended csp merge: every event sees the freshest value of every
    stream; nulls before a stream's first tick (SURVEY B2')."""
    x = _stream(spark, [(0, 1), (4, 2)], stream_id=0)
    y = _stream(spark, [(2, 9)], stream_id=1)
    out = last_value_merge({"x": x, "y": y}).orderBy("ts", "seq").collect()
    assert [(r["x"], r["y"]) for r in out] == [(1.0, None), (1.0, 9.0), (2.0, 9.0)]


def test_running_combine_matches_reference_example(spark):
    """e2_ticking.py:10-27: emit x+y and a cumulative accumulator on every
    tick of either input."""
    x = _stream(spark, [(0, 1), (2, 3)], stream_id=0)
    y = _stream(spark, [(1, 10)], stream_id=1)
    out = running_combine(x, y).orderBy("ts", "seq").collect()
    assert [(r["xy_sum"], r["accum"]) for r in out] == [
        (None, None),          # only x has ticked
        (11.0, 11.0),          # x=1, y=10
        (13.0, 24.0),          # x=3, y=10
    ]


def test_spread_requires_both_sides(spark):
    """e3_show_graph.py:11-29: spread emitted once both bid and ask ticked."""
    bid = _stream(spark, [(0, 100), (3, 101)], stream_id=0)
    ask = _stream(spark, [(1, 102)], stream_id=1)
    out = spread(bid, ask).orderBy("ts", "seq").collect()
    assert [(r["ts"], r["spread"]) for r in out] == [(_ts(1), 2.0), (_ts(3), 1.0)]


def test_asof_join_takes_latest_right(spark):
    """Book mark-to-market shape (e4_trade_pnl.py:36-70): each left row sees
    the most recent right value; none before the first quote."""
    trades = _stream(spark, [(1, 0), (5, 0)], stream_id=0)
    quotes = _stream(spark, [(2, 50), (4, 60)], stream_id=1).withColumnRenamed(
        "value", "mid"
    )
    out = asof_join(trades, quotes, right_cols=["mid"]).orderBy("ts").collect()
    assert [r["mid"] for r in out] == [None, 60.0]


def test_sliding_weighted_mean_window_prunes(spark):
    """MovingAverage (e2_stats.py:35-65): only events inside the trailing
    interval contribute; boundary (t - interval) is inclusive."""
    df = _stream(spark, [(0, 10), (60, 20), (121, 30)]).withColumn(
        "w", F.lit(1).cast("long")
    )
    out = sliding_weighted_mean(
        df, value="value", weight="w", interval_seconds=120, out="m"
    ).orderBy("ts").collect()
    # event at 121 s: frame covers [1 s, 121 s] -> events at 60 and 121 only
    assert [r["m"] for r in out] == [10.0, 15.0, 25.0]


def test_feedback_recurrence_timing(spark):
    """e1_feedback.py:27-59: order i at t0 + i*(0.3+0.7)s, ACK 0.7 s later,
    10 orders total (~1 s per round trip, SURVEY B8)."""
    out = feedback_orders(spark, T0).orderBy("order_id").collect()
    assert len(out) == 10
    assert out[3]["send_ts"] == _ts(3.0)
    assert out[3]["ack_ts"] == _ts(3.7)


def test_cart_fold_fifo_removal(spark):
    """e5_retail_cart.py:34-68: removals deplete oldest entries first;
    discount applies inside the window only."""
    rows = [
        # user 1: add 2 @ 10.0 (discounted: 9.0), add 1 @ 20.0 (after window),
        # remove 2 -> depletes the first entry entirely
        (_ts(0), 1, 1, "click", 10.0, 2),
        (_ts(7200), 2, 1, "click", 20.0, 1),
        (_ts(7300), 3, 1, "error", 0.0, 2),
    ]
    df = spark.createDataFrame(
        rows, "ts timestamp, seq long, user_id long, event_type string, value double, vol long"
    )
    out = cart_fold(df, discount=0.9, discount_seconds=3600).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["cart_qty"], r["cart_value"], r["n_updates"]) == (1, 20.0, 3)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0


def test_driver_contract_parity():
    """Every oracle names a declared query and EVERY query carries an
    oracle (round 4 closed the last two rows-only allowances: the HLL
    sketch is contract-checked, k-means is loop-unrolled).  Catches a
    key typo before the driver's gate does."""
    import sys
    sys.path.insert(0, ".")
    import __spark_entry__ as m

    qs, os_ = m.queries(), m.oracle_sql()
    assert set(os_) <= set(qs), set(os_) - set(qs)
    assert set(qs) - set(os_) == set()
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in os_.values())


def test_gated_queries_emit_only_primitive_columns(spark):
    """The external comparator canonicalizes results with pandas
    (sort_values + factorize), which cannot hash array/map/struct/binary
    cells -- the exact failure that voided user_event_paths' round-3
    check.  Every query inside the 50-key gate window must therefore
    emit primitive columns only.  (Outside the window, complex outputs
    are fine -- they are compared by this repo's stricter local tool,
    which tuple-ifies them.)"""
    import itertools
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as m
    from pyspark.sql import types as T

    complex_types = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)
    offenders = []
    for name, fn in itertools.islice(m.queries().items(), 50):
        df = fn(spark, "/root/testdata/sf0.001")
        for f in df.schema.fields:
            if isinstance(f.dataType, complex_types):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, offenders


def test_positional_index_matches_global_row_number(spark, tmp_path):
    """The two-scan partition-offset positional index equals the
    single-task row_number ground truth on a file source, for any
    partition count."""
    from pyspark.sql import Window

    from async_stream_processing_spark.operators.merge import positional_index

    path = str(tmp_path / "pos_src")
    spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 3 % 17).alias("v")
    ).repartition(6).write.parquet(path)
    df = spark.read.parquet(path)

    got = {r["k"]: r["pos"] for r in positional_index(df).collect()}
    # ground truth: one task, rows in the same scan order
    w = Window.orderBy(F.monotonically_increasing_id())
    truth = {
        r["k"]: r["p"]
        for r in df.coalesce(1)
        .select("k", (F.row_number().over(w) - 1).alias("p"))
        .collect()
    }
    assert len(got) == 5000
    assert sorted(got.values()) == list(range(5000))
    # positions are contiguous per source partition and globally unique;
    # the per-row mapping matches the sequential-reader order
    assert got == truth


def test_max_drawdown_hand_computed(spark):
    from async_stream_processing_spark.operators.windows import max_drawdown

    # equity walk: 10, 30, 5, 20, -5  -> peak 30, trough -5, dd 35
    vals = [10.0, 20.0, -25.0, 15.0, -25.0]
    rows = [
        (i, __import__("datetime").datetime(2024, 1, 1, 0, i), 1, v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    out = max_drawdown(df, ["user_id"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["max_drawdown"] == 35.0
    assert r["peak_equity"] == 30.0
    assert r["final_equity"] == -5.0
    assert r["n_events"] == 5


def test_bollinger_bands_constant_series_pins_to_mean(spark):
    from async_stream_processing_spark.operators.windows import (
        bollinger_bands,
    )

    rows = [
        (i, __import__("datetime").datetime(2024, 1, 1, 0, i), 1, 7.0)
        for i in range(5)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    out = bollinger_bands(df, ["user_id"], n_rows=3).collect()
    assert all(r["mid"] == r["upper"] == r["lower"] == 7.0 for r in out)


def test_temperature_mixture_boosts_low_resource_sources(spark):
    import math

    from async_stream_processing_spark.llm.curation import temperature_mixture

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = {r["source"]: r for r in
           temperature_mixture(docs, total_target=100).collect()}
    # proportional would give small 10%; sqrt-temperature gives ~25%
    w_small = math.sqrt(100) / (math.sqrt(900) + math.sqrt(100))
    assert abs(out["small"]["weight"] - w_small) < 1e-9
    assert out["small"]["target_docs"] == int(100 * w_small)
    assert out["big"]["n_docs"] == 900
    # budgets never exceed the target total
    assert sum(r["target_docs"] for r in out.values()) <= 100


def test_dedup_keep_best_keeps_longest_and_singletons(spark):
    from async_stream_processing_spark.llm.dedup import dedup_keep_best

    base = ("the quick brown fox jumps over the lazy sleeping dog "
            "while rain falls softly on the quiet empty street tonight")
    docs = spark.createDataFrame(
        [
            (0, base, len(base)),
            (1, base + " extra trailing words here", len(base) + 27),
            (2, "a completely different short unrelated document "
                "about weather patterns in the north", 83),
        ],
        "doc_id long, text string, n_chars long",
    )
    out = {r["cluster_id"]: r for r in
           dedup_keep_best(docs, threshold=0.5).collect()}
    # docs 0 and 1 are near-dups -> one cluster keeping the LONGER doc 1
    assert out[0]["survivor_doc_id"] == 1
    assert out[0]["cluster_size"] == 2
    # doc 2 is a singleton surviving as itself
    assert out[2]["survivor_doc_id"] == 2
    assert out[2]["cluster_size"] == 1
