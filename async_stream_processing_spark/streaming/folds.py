"""Bounded-state incremental streaming folds (round-9 verdict item 1).

The round-8 streaming twins of the sequential-recurrence family (CUSUM,
EWMA, Wilder RSI, OLS trend, max drawdown) held each key's ENTIRE event
history in aggregation state (``array_sort(collect_list(...))`` under
complete mode) — exact, arrival-order-independent, and a straight OOM
at 100x scale: a hot key with 1e9 events is 1e9 struct rows in the
state store.

This module replaces that pattern with the ``streaming/cart.py``
machinery: ``applyInPandasWithState`` keyed folds whose per-key state
is a FIXED-WIDTH struct of sufficient statistics — O(1) longs per key,
never O(events), bounded BY CONSTRUCTION (the state schema admits no
arrays/maps/strings; pytest asserts that structurally).  Each
micro-batch's rows are sorted per key in (ts, event_id) event-time
order and folded into the carried statistics; the watermark bounds how
late a row may arrive (the reference itself has NO late tolerance —
SURVEY §2 — so any watermark is strictly more forgiving).

Exactness discipline: every recurrence runs in the SAME scaled-integer
arithmetic as its batch twin (``operators/analytics.py``,
``operators/windows.py``), including Spark's truncate-toward-zero
integer division, so the drained stream still hash-matches the
batch/DuckDB oracle bit-for-bit.  All float math (RSI ratio, OLS
slope/r2, drawdown dollars) happens AFTER the fold, Spark-side, through
the identical IEEE expression trees the batch twins use.

Ordering contract: an incremental fold here is exact when each key's
rows arrive across micro-batches in non-decreasing (ts, event_id)
order — i.e. the source replays time-ordered, the normal shape of a
log/CDC source (Kafka per-partition order, time-partitioned file
landing).  Within a batch, arrival order is free (we sort).  The gated
fixtures replay the events table as K time-split files (oldest-first
file source order), so the cross-batch carry is genuinely exercised.
For sources that interleave rows out of time order ACROSS batches, the
reorder-buffered twins in :mod:`streaming.reorder` remove this
contract entirely (exact for any disorder within the watermark delay)
by holding rows in state until the watermark passes — these ordered
folds remain the zero-buffer fast path.  Both paths share the pure
kernels below, so the recurrences cannot drift.

The reference's analog is a per-key Python accumulator in a callback
(``/root/reference/src/async_stream_processing/processor.py:185-194``
consumes events one at a time into closures); here the accumulator is
engine-managed keyed state that shards across executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

__all__ = [
    "cusum_fold_stream",
    "ewma_fold_stream",
    "rsi_fold_stream",
    "ols_fold_stream",
    "drawdown_fold_stream",
    "bollinger_fold_stream",
    "corr_fold_stream",
    "STATE_SCHEMAS",
]

#: Frame width of the O(k) rolling fold's state (bollinger, k-1 carried
#: values).  Fixed at module level so the state schema stays a
#: FIXED-WIDTH struct of scalar longs — the same structural boundedness
#: guarantee as the O(1) folds, for k known at plan time.
BOLLINGER_K = 20

#: State schemas are fixed-width scalar structs ONLY — the boundedness
#: claim is structural and pytest-asserted (no ArrayType/MapType/String).
STATE_SCHEMAS = {
    "cusum": (
        "anchor BIGINT, c BIGINT, m BIGINT, smax BIGINT, "
        "n_over BIGINT, alarm BIGINT, n BIGINT"
    ),
    "ewma": "ew BIGINT, n BIGINT",
    "rsi": "prev_y BIGINT, ag BIGINT, al BIGINT, n BIGINT",
    "ols": "n BIGINT, sy BIGINT, sxy BIGINT, syy BIGINT",
    "drawdown": "eq BIGINT, peak BIGINT, dd BIGINT, n BIGINT",
    # O(k) rolling frame: cnt + the (k-1) most recent values, oldest
    # first, unused tail NULL — still a fixed-width scalar-long struct
    "bollinger": "cnt BIGINT, " + ", ".join(
        f"v{i} BIGINT" for i in range(BOLLINGER_K - 1)
    ),
    # O(k) rolling (x, lag-x) pairs + the carried previous value; y is
    # NULL only for a key's very first row
    "corr": "cnt BIGINT, prev_x BIGINT, " + ", ".join(
        f"x{i} BIGINT, y{i} BIGINT" for i in range(BOLLINGER_K - 1)
    ),
}


def _sorted_values(pdfs: Iterator[pd.DataFrame], cols: list[str]):
    """Concatenate a key's micro-batch chunks and yield ``cols`` as
    numpy arrays in (ts, event_id) event-time order — arrival order
    within the batch is irrelevant by construction."""
    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    return [pdf[c].to_numpy() for c in cols]


# ---------------------------------------------------------------------------
# Pure recurrence kernels.  Each consumes a core tuple plus event-time
# ordered values and returns the advanced core (and, for the per-event
# family, the emitted rows).  They are the SINGLE definition of every
# recurrence — the ordered folds below and the reorder-buffered
# wrappers in streaming/reorder.py both call them, so the two paths
# cannot drift (differential-tested besides).
# ---------------------------------------------------------------------------

CORE_INIT = {
    "cusum": (0, 0, 0, 0, 0, None, 0),
    "ewma": (0, 0),
    "rsi": (0, 0, 0, 0),
    "ols": (0, 0, 0, 0),
    "drawdown": (0, 0, 0, 0),
}


def cusum_kernel(core, xs, eids, slack: int = 50,
                 threshold: int = 2000) -> tuple:
    anchor, c, m, smax, n_over, alarm, n = core
    for x, eid in zip(xs, eids):
        if n == 0:
            anchor = x
        c += x - anchor - slack
        if c < m:
            m = c
        s = c - m
        if s > smax:
            smax = s
        if s > threshold:
            n_over += 1
            if alarm is None or eid < alarm:
                alarm = eid
        n += 1
    return (anchor, c, m, smax, n_over, alarm, n)


def ewma_kernel(core, xs, w_old: int = 7, w_new: int = 3,
                den: int = 10) -> tuple:
    ew, n = core
    for x in xs:
        if n == 0:
            ew = x
        else:
            y = ew * w_old + x * w_new
            ew = y // den if y >= 0 else -((-y) // den)
        n += 1
    return (ew, n)


def rsi_kernel(core, ys, period: int = 14) -> tuple:
    prev_y, ag, al, n = core
    for y in ys:
        if n >= 1:
            d = y - prev_y
            g = (d if d > 0 else 0) * 1_000_000
            loss = (-d if d < 0 else 0) * 1_000_000
            if n == 1:
                ag, al = g, loss
            else:
                ag = (ag * (period - 1) + g) // period
                al = (al * (period - 1) + loss) // period
        prev_y = y
        n += 1
    return (prev_y, ag, al, n)


def ols_kernel(core, ys) -> tuple:
    n, sy, sxy, syy = core
    for y in ys:
        n += 1
        sy += y
        sxy += n * y
        syy += y * y
    return (n, sy, sxy, syy)


def drawdown_kernel(core, xs) -> tuple:
    eq, peak, dd, n = core
    for x in xs:
        if n == 0:
            eq = x
            peak = x
            dd = 0
        else:
            eq += x
            if eq > peak:
                peak = eq
            elif peak - eq > dd:
                dd = peak - eq
        n += 1
    return (eq, peak, dd, n)


def bollinger_kernel(core: list, uid, ts_list, eids, xs,
                     k_carry: int = BOLLINGER_K - 1):
    """Rolling frame-sum kernel: ``core`` is the list of the k-1 most
    recent values (oldest first).  Returns (new core, emitted rows) —
    rows are (user_id, ts, event_id, n, sx_c, sxx_c4)."""
    buf = list(core)
    rows = []
    run_sx = sum(buf)
    run_sxx = sum(v * v for v in buf)
    for ts, eid, x in zip(ts_list, eids, xs):
        rows.append((uid, ts, eid, len(buf) + 1,
                     run_sx + x, run_sxx + x * x))
        buf.append(x)
        run_sx += x
        run_sxx += x * x
        if len(buf) > k_carry:
            old = buf.pop(0)
            run_sx -= old
            run_sxx -= old * old
    assert len(buf) <= k_carry  # bounded BY CONSTRUCTION
    return buf, rows


def corr_kernel(core: tuple, uid, ts_list, eids, xs,
                k_carry: int = BOLLINGER_K - 1):
    """Rolling lag-1 Pearson kernel: ``core`` = (prev_x, buf of (x,
    lag-x) pairs).  Returns (new core, rows) — rows are (user_id, ts,
    event_id, n, sx_c, sy_c, sxy_c4, sxx_c4, syy_c4)."""
    prev_x, buf = core
    buf = list(buf)
    rows = []
    n_v = sum(1 for _, b in buf if b is not None)
    sx = sum(a for a, b in buf if b is not None)
    sy = sum(b for _, b in buf if b is not None)
    sxy = sum(a * b for a, b in buf if b is not None)
    sxx = sum(a * a for a, b in buf if b is not None)
    syy = sum(b * b for _, b in buf if b is not None)
    for ts, eid, x in zip(ts_list, eids, xs):
        y = prev_x
        if y is not None:
            rows.append((uid, ts, eid, n_v + 1, sx + x, sy + y,
                         sxy + x * y, sxx + x * x, syy + y * y))
        else:
            rows.append((uid, ts, eid, n_v, sx, sy, sxy, sxx, syy))
        buf.append((x, y))
        if y is not None:
            n_v += 1
            sx += x
            sy += y
            sxy += x * y
            sxx += x * x
            syy += y * y
        if len(buf) > k_carry:
            ox, oy = buf.pop(0)
            if oy is not None:
                n_v -= 1
                sx -= ox
                sy -= oy
                sxy -= ox * oy
                sxx -= ox * ox
                syy -= oy * oy
        prev_x = x
    assert len(buf) <= k_carry
    return (prev_x, buf), rows


def _emit(state, values: tuple, columns: list[str]) -> pd.DataFrame:
    """Update state and emit ONE row carrying it (per key per batch).
    The drained final row per key is the one with max ``n`` — the same
    final-state-row convention as the cart fold."""
    state.update(values)
    return pd.DataFrame([values], columns=columns, dtype=object)


def _apply(stream, fold_fn, out_schema: str, state_key: str):
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            fold_fn,
            outputStructType=out_schema,
            stateStructType=STATE_SCHEMAS[state_key],
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def cusum_fold_stream(stream, slack: int = 50, threshold: int = 2000):
    """Page's one-sided CUSUM as an O(1)-state incremental fold.

    State: (anchor, c, m, smax, n_over, alarm, n) — the sufficient
    statistics of ``operators/analytics.cusum_drift``'s reflected-walk
    form: c = cumsum(x - anchor - slack), m = min(0, running-min c),
    statistic s = c - m.  The alarm id is the MIN alarming event_id
    (order-free, same as the batch MIN(CASE...)).  Input rows carry
    ``x`` = integer cents, computed Spark-side."""

    def fold(key, pdfs, state):
        uid = int(key[0])
        core = tuple(state.get) if state.exists else CORE_INIT["cusum"]
        xs, eids = _sorted_values(pdfs, ["x", "event_id"])
        core = cusum_kernel(core, xs.tolist(), eids.tolist(),
                            slack, threshold)
        yield _emit(
            state, core,
            ["anchor", "c", "m", "smax", "n_over", "alarm", "n"],
        ).assign(user_id=uid)

    out_schema = (
        "anchor BIGINT, c BIGINT, m BIGINT, smax BIGINT, n_over BIGINT, "
        "alarm BIGINT, n BIGINT, user_id BIGINT"
    )
    return _apply(stream, fold, out_schema, "cusum")


def ewma_fold_stream(stream, w_old: int = 7, w_new: int = 3,
                     den: int = 10):
    """EWMA (alpha = w_new/den; default 0.3 — the x7/x3 scaled-integer
    dialect of ``operators/windows.ewma_exact``) as an O(1)-state fold.
    The recurrence ``ew = trunc((ew*w_old + x*w_new) / den)`` matches
    Spark's ``(y - y % den) / den`` truncate-toward-zero division for
    any sign (the fuzz grammar exercises non-default weights)."""

    def fold(key, pdfs, state):
        uid = int(key[0])
        core = tuple(state.get) if state.exists else CORE_INIT["ewma"]
        (xs,) = _sorted_values(pdfs, ["x"])
        core = ewma_kernel(core, xs.tolist(), w_old, w_new, den)
        yield _emit(state, core, ["ew", "n"]).assign(user_id=uid)

    return _apply(stream, fold, "ew BIGINT, n BIGINT, user_id BIGINT", "ewma")


def rsi_fold_stream(stream, period: int = 14):
    """Wilder RSI smoothing as an O(1)-state fold: state carries the
    previous value (to derive the diff across the batch boundary) and
    the two Wilder accumulators (avg gain/loss, x1e6 scaled ints).
    Seed = the FIRST gain/loss (the recursive-seed dialect of
    ``operators/windows.rsi_wilder``); thereafter
    ``acc = trunc((acc*(p-1) + v) / p)``."""

    def fold(key, pdfs, state):
        uid = int(key[0])
        core = tuple(state.get) if state.exists else CORE_INIT["rsi"]
        (ys,) = _sorted_values(pdfs, ["y"])
        core = rsi_kernel(core, ys.tolist(), period)
        yield _emit(
            state, core, ["prev_y", "ag", "al", "n"]
        ).assign(user_id=uid)

    out_schema = "prev_y BIGINT, ag BIGINT, al BIGINT, n BIGINT, user_id BIGINT"
    return _apply(stream, fold, out_schema, "rsi")


def ols_fold_stream(stream):
    """Per-key OLS over (index, y) as an O(1)-state fold: the FOUR
    carried integer sums (n, sy, sxy, syy); sx/sxx come closed-form
    from n downstream (``n(n+1)/2``, ``n(n+1)(2n+1)/6`` — exact
    integer ``div``), exactly as the batch ``ols_trend``.  The time
    index is the 1-based event-time position, so the carried ``n``
    numbers the first row of each batch correctly."""

    def fold(key, pdfs, state):
        uid = int(key[0])
        core = tuple(state.get) if state.exists else CORE_INIT["ols"]
        (ys,) = _sorted_values(pdfs, ["y"])
        core = ols_kernel(core, ys.tolist())
        yield _emit(
            state, core, ["n", "sy", "sxy", "syy"]
        ).assign(user_id=uid)

    out_schema = "n BIGINT, sy BIGINT, sxy BIGINT, syy BIGINT, user_id BIGINT"
    return _apply(stream, fold, out_schema, "ols")


def bollinger_fold_stream(stream, n_rows: int = BOLLINGER_K):
    """Rolling ``n_rows``-row Bollinger frame sums as an O(k)-state fold
    — the bounded-WINDOW case of the family (CUSUM/EWMA/OLS carry O(1)
    scalars; a rows-frame statistic needs the k-1 most recent values to
    retire the departing element, and nothing more — never the event
    history).  Per row it emits the EXACT integer frame sums (n,
    sum-cents, sum-cents²·1e-4) of the last ``n_rows`` values in
    (ts, event_id) order; the mean/±2σ IEEE tree runs Spark-side
    downstream, identical to ``operators/windows.bollinger_bands``, so
    the drained series hash-matches the batch oracle row for row.

    Output mode is append with ONE row per event (the rolling series,
    not a per-key reduction), so no final-row selection applies."""
    if n_rows != BOLLINGER_K:
        raise ValueError(
            f"state schema is fixed-width for k={BOLLINGER_K}; "
            f"got n_rows={n_rows}"
        )
    k_carry = n_rows - 1

    def fold(key, pdfs, state):
        uid = int(key[0])
        if state.exists:
            st = state.get
            cnt = st[0]
            buf = [v for v in st[1:1 + cnt]]
        else:
            buf = []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        buf, rows = bollinger_kernel(
            buf, uid, pdf["ts"].tolist(), pdf["event_id"].tolist(),
            pdf["x"].tolist(), k_carry,
        )
        state.update(
            (len(buf), *buf, *([None] * (k_carry - len(buf))))
        )
        yield pd.DataFrame(
            rows,
            columns=["user_id", "ts", "event_id", "n", "sx_c", "sxx_c4"],
            dtype=object,
        )

    out_schema = (
        "user_id BIGINT, ts TIMESTAMP, event_id BIGINT, "
        "n BIGINT, sx_c BIGINT, sxx_c4 BIGINT"
    )
    return _apply(stream, fold, out_schema, "bollinger")


def corr_fold_stream(stream, n_rows: int = BOLLINGER_K):
    """Rolling lag-1 Pearson frame sums as an O(k)-state fold — the
    two-series member of the bounded-window family: state is the k-1
    most recent (x, lag-x) pairs plus the carried previous value (the
    lag crosses the micro-batch boundary through ``prev_x``).  Emits
    each event's exact integer frame sums over the frame's lag-valid
    rows (n, Sx, Sy, Sxy, Sxx, Syy — the cents/cents² discipline of
    ``operators/windows.rolling_corr``); the Pearson IEEE tree runs
    Spark-side downstream, so the drained series hash-matches the batch
    oracle row for row.  Running sums retire the departing pair: O(1)
    per event."""
    if n_rows != BOLLINGER_K:
        raise ValueError(
            f"state schema is fixed-width for k={BOLLINGER_K}; "
            f"got n_rows={n_rows}"
        )
    k_carry = n_rows - 1

    def fold(key, pdfs, state):
        uid = int(key[0])
        if state.exists:
            st = state.get
            cnt, prev_x = st[0], st[1]
            flat = st[2:2 + 2 * cnt]
            buf = [(flat[2 * i], flat[2 * i + 1]) for i in range(cnt)]
        else:
            prev_x = None
            buf = []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        (prev_x, buf), rows = corr_kernel(
            (prev_x, buf), uid, pdf["ts"].tolist(),
            pdf["event_id"].tolist(), pdf["x"].tolist(), k_carry,
        )
        flat_out: list = []
        for a, b in buf:
            flat_out.extend((a, b))
        flat_out.extend([None] * (2 * (k_carry - len(buf))))
        state.update((len(buf), prev_x, *flat_out))
        yield pd.DataFrame(
            rows,
            columns=["user_id", "ts", "event_id", "n",
                     "sx_c", "sy_c", "sxy_c4", "sxx_c4", "syy_c4"],
            dtype=object,
        )

    out_schema = (
        "user_id BIGINT, ts TIMESTAMP, event_id BIGINT, n BIGINT, "
        "sx_c BIGINT, sy_c BIGINT, sxy_c4 BIGINT, sxx_c4 BIGINT, "
        "syy_c4 BIGINT"
    )
    return _apply(stream, fold, out_schema, "corr")


def drawdown_fold_stream(stream):
    """Equity/peak/drawdown recurrence as an O(1)-state fold in integer
    cents: eq = running sum, peak = running max(eq), dd = max(peak-eq).
    First value SEEDS the equity (same as the batch fold's init)."""

    def fold(key, pdfs, state):
        uid = int(key[0])
        core = tuple(state.get) if state.exists else CORE_INIT["drawdown"]
        (xs,) = _sorted_values(pdfs, ["x"])
        core = drawdown_kernel(core, xs.tolist())
        yield _emit(
            state, core, ["eq", "peak", "dd", "n"]
        ).assign(user_id=uid)

    out_schema = "eq BIGINT, peak BIGINT, dd BIGINT, n BIGINT, user_id BIGINT"
    return _apply(stream, fold, out_schema, "drawdown")
