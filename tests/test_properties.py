"""Property-based tests: operators vs brute-force Python references on
random inputs (the reference repo has none -- SURVEY §5; these pin our
semantics harder than fixtures can)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from async_stream_processing_spark.operators.analytics import (
    sessionize,
    sessionize_native,
)
from async_stream_processing_spark.operators.asof import asof_join
from async_stream_processing_spark.operators.merge import last_value_merge

T0 = datetime(2024, 1, 1)

# (seconds, value) event lists; seconds may collide to exercise tie-breaks
events_strategy = st.lists(
    st.tuples(st.integers(0, 120), st.integers(0, 100)), min_size=1, max_size=25
)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows, stream_id=0, value_col="value"):
    return spark.createDataFrame(
        [
            (T0 + timedelta(seconds=s), (stream_id << 40) + i + 1, float(v))
            for i, (s, v) in enumerate(rows)
        ],
        f"ts timestamp, seq long, {value_col} double",
    )


@given(left=events_strategy, right=events_strategy)
@SLOW
def test_asof_join_matches_bruteforce(spark, left, right):
    trades = _df(spark, left, stream_id=1)
    quotes = _df(spark, right, stream_id=0, value_col="mid")
    out = {
        r["seq"]: r["mid"]
        for r in asof_join(trades, quotes, right_cols=["mid"]).collect()
    }
    # brute force: latest right event with (ts, seq) <= (ts, seq) of left
    rkeys = sorted(
        (T0 + timedelta(seconds=s), i + 1, float(v))
        for i, (s, v) in enumerate(right)
    )
    for i, (s, v) in enumerate(left):
        lt, lseq = T0 + timedelta(seconds=s), (1 << 40) + i + 1
        best = None
        for rt, rseq, rv in rkeys:
            if (rt, rseq) <= (lt, lseq):
                best = rv
        assert out[lseq] == best


@given(xs=events_strategy, ys=events_strategy)
@SLOW
def test_last_value_merge_matches_bruteforce(spark, xs, ys):
    merged = last_value_merge(
        {"x": _df(spark, xs, 0), "y": _df(spark, ys, 1)}
    ).collect()
    tagged = sorted(
        [(T0 + timedelta(seconds=s), i + 1, "x", float(v)) for i, (s, v) in enumerate(xs)]
        + [(T0 + timedelta(seconds=s), (1 << 40) + i + 1, "y", float(v))
           for i, (s, v) in enumerate(ys)]
    )
    lastx = lasty = None
    expected = {}
    for ts, seq, which, v in tagged:
        if which == "x":
            lastx = v
        else:
            lasty = v
        expected[seq] = (lastx, lasty)
    for r in merged:
        assert (r["x"], r["y"]) == expected[r["seq"]]


@given(rows=st.lists(
    st.tuples(st.integers(0, 3600 * 4), st.integers(1, 3), st.integers(0, 50)),
    min_size=1, max_size=30,
))
@SLOW
def test_sessionize_native_equals_relational(spark, rows):
    df = spark.createDataFrame(
        [
            (T0 + timedelta(seconds=s), i + 1, u, float(v))
            for i, (s, u, v) in enumerate(rows)
        ],
        "ts timestamp, seq long, user_id long, value double",
    )
    a = sorted(map(tuple, sessionize(df, gap_seconds=1800).collect()))
    b = sorted(map(tuple, sessionize_native(df, gap_seconds=1800).collect()))
    assert a == b


# cart event sequences: (seconds, kind, qty, price_cents) -- over-removals,
# ties, and discount-boundary crossings all occur under random generation
cart_strategy = st.lists(
    st.tuples(
        st.integers(0, 7200),            # seconds from T0 (crosses 3600 s window)
        st.sampled_from(["click", "error"]),
        st.integers(1, 5),               # qty
        st.integers(0, 9999),            # price in cents (2-dp money)
    ),
    min_size=1, max_size=30,
)


def _cart_python(rows, discount=0.9, discount_seconds=3600):
    """Straight-line FIFO simulation of e5_retail_cart.py:34-68 in integer
    tenth-cents (the operators' exact-money convention)."""
    t0 = rows[0][0]
    cart: list[list[int]] = []
    n = 0
    for s, kind, qty, cents in rows:
        if kind == "click":
            unit = round(cents * 10 * (discount if s < t0 + discount_seconds else 1.0))
            cart.append([qty, unit])
        else:
            while qty > 0 and cart:
                take = min(qty, cart[0][0])
                cart[0][0] -= take
                qty -= take
                if cart[0][0] == 0:
                    cart.pop(0)
        n += 1
    return (n, sum(q for q, _ in cart),
            sum(q * c for q, c in cart) / 1000.0)


@given(rows=cart_strategy)
@SLOW
def test_cart_fold_matches_bruteforce(spark, rows):
    """cart_fold (mapInPandas) == straight FIFO simulation, including
    over-removals and discount-window boundaries.  The recursive-CTE SQL
    oracle (cart_fold_state) is itself checked against cart_fold by the
    oracle gate, so this transitively pins all three."""
    from async_stream_processing_spark.operators.session_state import cart_fold

    rows = sorted(rows)  # the operator sorts by (ts, seq); fix event order
    df = spark.createDataFrame(
        [
            (T0 + timedelta(seconds=s), i + 1, 7, kind, cents / 100.0, qty)
            for i, (s, kind, qty, cents) in enumerate(rows)
        ],
        "ts timestamp, seq long, user_id long, event_type string, "
        "value double, vol long",
    )
    out = cart_fold(df).collect()
    assert len(out) == 1
    r = out[0]
    n, qty, value = _cart_python(rows)
    assert (r["n_updates"], r["cart_qty"], r["cart_value"]) == (n, qty, value)


# (group, actor, flagged) triples; small domains force collisions
q21_rows_strategy = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 4), st.booleans()),
    min_size=1,
    max_size=30,
)


@given(rows=q21_rows_strategy)
@SLOW
def test_sole_contributor_matches_bruteforce(spark, rows):
    from async_stream_processing_spark.operators.analytics import sole_contributor

    df = spark.createDataFrame(rows, "g long, a long, flag boolean")
    out = sole_contributor(
        df.filter("flag"), group="g", actor="a",
        population=df, co_candidates=df.filter("flag"),
    )
    got = sorted((r["g"], r["a"]) for r in out.collect())
    actors: dict[int, set[int]] = {}
    flagged: dict[int, set[int]] = {}
    for g, a, f in rows:
        actors.setdefault(g, set()).add(a)
        if f:
            flagged.setdefault(g, set()).add(a)
    expect = sorted(
        (g, a)
        for g, a, f in rows
        if f and len(actors[g] - {a}) > 0 and flagged[g] == {a}
    )
    assert got == expect


@given(left=events_strategy, right=events_strategy,
       bucket=st.sampled_from([1, 7, 30, 3600]))
@SLOW
def test_asof_join_bucketed_equivalent(spark, left, right, bucket):
    """Time-bucketed as-of carry == plain union-and-carry for ANY bucket
    size (the cross-bucket summary propagation must be seamless),
    keyed or not, strict or not."""
    import warnings as _w

    from async_stream_processing_spark.operators.asof import asof_join_bucketed

    trades = _df(spark, left, stream_id=1)
    quotes = _df(spark, right, stream_id=0, value_col="mid")
    for strict in (False, True):
        with _w.catch_warnings():
            _w.simplefilter("ignore", UserWarning)
            # single_partition forces the PLAIN union-and-carry so the
            # differential stays implementation-independent (unkeyed
            # asof_join now auto-delegates to the bucketed form)
            plain = {
                r["seq"]: r["mid"]
                for r in asof_join(
                    trades, quotes, right_cols=["mid"], strict=strict,
                    single_partition=True,
                ).collect()
            }
        bucketed = {
            r["seq"]: r["mid"]
            for r in asof_join_bucketed(
                trades, quotes, right_cols=["mid"],
                bucket_seconds=bucket, strict=strict,
            ).collect()
        }
        assert bucketed == plain


# (lo, length) band specs + fact values, all integers scaled to land on
# and around bucket boundaries (the tricky cases: hi exactly on a
# boundary, bands wider than a bucket, overlapping bands)
range_join_strategy = st.tuples(
    st.lists(st.tuples(st.integers(-10, 40), st.integers(1, 25)),
             min_size=1, max_size=8),
    st.lists(st.integers(-10, 70), min_size=1, max_size=30),
    st.sampled_from([1.0, 4.0, 10.0]),
)


@given(range_join_strategy)
@SLOW
def test_range_join_bucketized_equals_theta(spark, case):
    """The bucketized equi-join rewrite returns exactly the theta-join
    rows for any band layout (overlapping, boundary-aligned, wider or
    narrower than the bucket) and any bucket width."""
    from async_stream_processing_spark.operators.range_join import range_join

    bands_spec, values, width = case
    bands = spark.createDataFrame(
        [(i, float(lo), float(lo + ln)) for i, (lo, ln) in enumerate(bands_spec)],
        "band_id int, lo double, hi double",
    )
    facts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)],
        "fact_id int, value double",
    )
    theta = {
        (r["fact_id"], r["band_id"])
        for r in facts.join(
            bands,
            (bands.lo <= facts.value) & (facts.value < bands.hi),
        ).collect()
    }
    bucketized = {
        (r["fact_id"], r["band_id"])
        for r in range_join(facts, bands, "value", bucket_width=width).collect()
    }
    assert bucketized == theta


def test_funnel_steps_requires_order(spark):
    """A later step only counts AT OR AFTER the previous step's first
    time: a purchase before the first click is invisible to step 3."""
    from async_stream_processing_spark.operators.analytics import funnel_steps

    rows = [
        # user 1: signup(10) -> click(20) -> purchase(30): converts
        (1, 10, "signup"), (1, 20, "click"), (1, 30, "purchase"),
        # user 2: purchase(5) BEFORE signup(10)+click(20): no conversion
        (2, 5, "purchase"), (2, 10, "signup"), (2, 20, "click"),
        # user 3: click(5) before signup(10), click(15) after: step2=15
        (3, 5, "click"), (3, 10, "signup"), (3, 15, "click"),
        # user 4: no signup at all: every step null
        (4, 7, "click"), (4, 9, "purchase"),
    ]
    df = spark.createDataFrame(
        [(u, T0 + timedelta(seconds=s), s, k) for u, s, k in rows],
        "user_id int, ts timestamp, seq long, event_type string",
    )
    out = {
        r["user_id"]: r
        for r in funnel_steps(df, "user_id", ["signup", "click", "purchase"]).collect()
    }
    assert out[1]["converted"] is True
    assert out[2]["converted"] is False and out[2]["step2_ts"] is not None
    assert out[3]["step2_ts"] == T0 + timedelta(seconds=15)
    assert out[4]["step1_ts"] is None and out[4]["converted"] is False


@given(left=events_strategy, right=events_strategy,
       tol=st.sampled_from([5, 17, 60]))
@SLOW
def test_asof_nearest_matches_bruteforce(spark, left, right, tol):
    """Bucketed nearest-match join == brute-force nearest within
    tolerance for random event sets and tolerances (bucket boundaries,
    ties at equal distance, empty bands all land in the random space)."""
    from async_stream_processing_spark.operators.asof import asof_join_nearest

    trades = _df(spark, left, stream_id=1)
    quotes = _df(spark, right, stream_id=0, value_col="mid")

    qrows = [(T0 + timedelta(seconds=s), (0 << 40) + i + 1, float(v))
             for i, (s, v) in enumerate(right)]

    def brute(ts, _seq):
        cands = [
            (abs((qts - ts).total_seconds()),
             0 if qts <= ts else 1, qts, qseq, mid)
            for qts, qseq, mid in qrows
            if abs((qts - ts).total_seconds()) <= tol
        ]
        return min(cands)[4] if cands else None

    got = {
        r["seq"]: r["mid"]
        for r in asof_join_nearest(
            trades, quotes, on=[], right_cols=["mid"],
            tolerance_seconds=tol,
        ).collect()
    }
    want = {
        (1 << 40) + i + 1: brute(T0 + timedelta(seconds=s), None)
        for i, (s, _v) in enumerate(left)
    }
    assert got == want


# per-user event lists: (seconds, step-name) with colliding times allowed
funnel_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),                       # user
        st.integers(0, 50),                      # seconds
        st.sampled_from(["signup", "click", "purchase", "view"]),
    ),
    min_size=1, max_size=30,
)


@given(funnel_strategy)
@SLOW
def test_funnel_steps_matches_bruteforce(spark, rows):
    """Stacked-window funnel == sequential brute force for random event
    soups (repeated steps, out-of-order arrivals, missing steps, ties)."""
    from async_stream_processing_spark.operators.analytics import funnel_steps

    df = spark.createDataFrame(
        [(u, T0 + timedelta(seconds=s), i + 1, k)
         for i, (u, s, k) in enumerate(rows)],
        "user_id int, ts timestamp, seq long, event_type string",
    )
    steps = ["signup", "click", "purchase"]

    def brute(user):
        evs = [(T0 + timedelta(seconds=s), k)
               for (u, s, k) in rows if u == user]
        out, cur = [], None
        for step in steps:
            cand = [t for t, k in evs if k == step
                    and (cur is None or t >= cur)]
            cur = min(cand) if cand else None
            out.append(cur)
            if cur is None:
                # later steps must anchor on a hit; all null afterwards
                return out + [None] * (len(steps) - len(out))
        return out

    got = {
        r["user_id"]: (r["step1_ts"], r["step2_ts"], r["step3_ts"],
                       r["converted"])
        for r in funnel_steps(df, "user_id", steps).collect()
    }
    for user in {u for u, _s, _k in rows}:
        w = brute(user)
        assert got[user] == (w[0], w[1], w[2], w[2] is not None), (
            user, got[user], w,
        )


def test_range_join_empty_band_matches_nothing(spark):
    """lo >= hi is an empty half-open interval: zero matches, and the
    bucketized path must not explode a descending bucket range for it."""
    from async_stream_processing_spark.operators.range_join import range_join

    bands = spark.createDataFrame(
        [(0, 10.0, 10.0), (1, 30.0, 20.0), (2, 0.0, 50.0)],
        "band_id int, lo double, hi double",
    )
    facts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([10.0, 25.0, 49.0])],
        "fact_id int, value double",
    )
    got = {
        (r["fact_id"], r["band_id"])
        for r in range_join(facts, bands, "value", bucket_width=8.0).collect()
    }
    assert got == {(0, 2), (1, 2), (2, 2)}


@given(
    data=st.data(),
)
@SLOW
def test_winnowed_substring_dups_find_planted_spans(spark, data):
    """Winnowing guarantee, randomized: a shared span covering a full
    window (>= n + w - 1 chars) is detected at ANY alignment, in any
    surrounding noise."""
    import random as _random

    from pyspark.sql import Row

    from async_stream_processing_spark.llm.dedup import substring_dups

    n, w = 12, 5
    seed = data.draw(st.integers(0, 10_000))
    rng = _random.Random(seed)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    span_len = rng.randrange(n + w - 1, n + w + 20)
    span = "".join(rng.choice(alpha) for _ in range(span_len))

    def noise(k):
        return "".join(rng.choice(alpha.upper()) for _ in range(k))

    rows = [
        Row(doc_id=i, text=noise(rng.randrange(0, 30)) + span
            + noise(rng.randrange(0, 30)))
        for i in range(3)
    ]
    out = substring_dups(spark.createDataFrame(rows), n=n, w=w).collect()
    hits = [r for r in out if r["n_docs"] == 3]
    assert hits, (seed, span)
    assert all(r["gram"] in span for r in hits)


@given(data=st.data())
@SLOW
def test_heavy_hitters_random_vs_bruteforce_any_partitioning(spark, data):
    import collections
    import random as _random

    from pyspark.sql import Row

    from async_stream_processing_spark.llm.text_analysis import heavy_hitters

    seed = data.draw(st.integers(0, 10_000))
    nparts = data.draw(st.sampled_from([1, 3, 16]))
    rng = _random.Random(seed)
    # zipf-ish vocab so some tokens actually cross the threshold
    vocab = [f"w{i}" for i in range(15)]
    weights = [1.0 / (i + 1) for i in range(15)]
    rows = [
        Row(doc_id=i,
            text=" ".join(rng.choices(vocab, weights=weights, k=25)))
        for i in range(30)
    ]
    counts = collections.Counter(t for r in rows for t in r.text.split())
    total = sum(counts.values())
    expect = {(t, c) for t, c in counts.items() if c * 10 > total}
    got = {
        (r["tok"], r["freq"])
        for r in heavy_hitters(
            spark.createDataFrame(rows).repartition(nparts), k=10
        ).collect()
    }
    assert got == expect, (seed, nparts)


# target: (key, version-tag) rows; cdc: (key, op) where op in
# {update, delete}; keys collide freely to exercise matched/unmatched
merge_target_strategy = st.lists(
    st.integers(0, 15), min_size=1, max_size=20, unique=True
)
merge_cdc_strategy = st.lists(
    st.tuples(st.integers(0, 20), st.booleans()),
    min_size=0, max_size=12,
    unique_by=lambda t: t[0],
)


@given(target=merge_target_strategy, cdc=merge_cdc_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_versioned_merge_matches_dict_reference(spark, tmp_path_factory,
                                                target, cdc):
    """merge_into == the obvious dict fold (update/delete/insert by
    key) on random targets and CDC batches, including empty CDC,
    all-delete, and insert-only shapes; the pre-merge version stays
    byte-stable."""
    from async_stream_processing_spark.plans.versioned import (
        commit_append,
        merge_into,
        read_version,
    )

    lake = str(tmp_path_factory.mktemp("vmerge") / "lake")
    commit_append(
        spark.createDataFrame(
            [(k, f"t{k}") for k in target], "k long, v string"
        ).repartition(2),
        lake,
    )
    merge_into(
        spark, lake,
        spark.createDataFrame(
            [(k, f"u{k}", d) for k, d in cdc],
            "k long, v string, is_delete boolean",
        ),
        ["k"], delete_col="is_delete",
    )
    # dict reference
    state = {k: f"t{k}" for k in target}
    for k, d in cdc:
        if d:
            state.pop(k, None)
        else:
            state[k] = f"u{k}"
    if state:
        head = {(r["k"], r["v"])
                for r in read_version(spark, lake).collect()}
        assert head == set(state.items())
    pre = {(r["k"], r["v"]) for r in read_version(spark, lake, 1).collect()}
    assert pre == {(k, f"t{k}") for k in target}


@given(
    lo_i=st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
    width=st.integers(min_value=0, max_value=1 << 40),
    c_lo=st.one_of(
        st.integers(min_value=-(1 << 62), max_value=(1 << 62)),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
    ),
    c_width=st.floats(min_value=0, max_value=1e18, allow_nan=False),
)
@settings(max_examples=300, deadline=None)
def test_int_query_bounds_never_prunes_a_true_keep(lo_i, width, c_lo,
                                                   c_width):
    """Property (r10 ADVICE, Spark-free): the integer-exact rewrite of
    the BIGINT stat comparison keeps a file whenever the exact rational
    comparison keeps it — the distributed prune is NEVER less
    conservative than the JSON loop.  (It may keep strictly more only
    through the documented int64 clamp, never fewer.)"""
    from fractions import Fraction

    from async_stream_processing_spark.plans.versioned import (
        _int_query_bounds,
    )

    import math

    from hypothesis import assume

    hi_i = min(lo_i + width, (1 << 63) - 1)
    c_hi = (float(c_lo) + c_width if isinstance(c_lo, float)
            else c_lo + int(c_width))
    assume(not (isinstance(c_hi, float) and math.isinf(c_hi)))
    ib = _int_query_bounds(c_lo, c_hi)
    assert ib is not None  # finite bounds always yield integer bounds
    lo_c, hi_f = ib
    keep_int = lo_i <= hi_f and hi_i >= lo_c
    # exact comparison in unbounded rationals (what the JSON loop's
    # native Python int/float comparison computes)
    keep_exact = (Fraction(lo_i) <= Fraction(c_hi)
                  and Fraction(hi_i) >= Fraction(c_lo))
    if keep_exact:
        assert keep_int, (lo_i, hi_i, c_lo, c_hi, ib)
