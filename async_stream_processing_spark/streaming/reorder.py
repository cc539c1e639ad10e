"""Within-watermark reorder buffer for the incremental streaming folds
(round-9 verdict item 2).

The ordered folds in :mod:`streaming.folds` are exact when each key's
rows arrive across micro-batches in non-decreasing (ts, event_id)
order — the shape of a time-partitioned log.  This module removes that
contract for sources that interleave rows OUT of time order across
micro-batches, as long as the disorder stays within the watermark
delay (the standard streaming late-data bound; the reference's own
scheduler tolerates none at all — it processes a strictly time-sorted
heap, ``/root/reference/src/async_stream_processing/processor.py:75-76``).

Mechanism (per key, inside ``applyInPandasWithState``):

* PENDING BUFFER — arriving rows land in a (ts, event_id, value)
  buffer carried in state, merged and kept event-time sorted.
* FINALIZE ON WATERMARK — rows strictly older than the current
  watermark can never be preceded by a future arrival (Spark's
  watermark contract), so they are folded into the fixed-width core
  statistics IN EVENT-TIME ORDER and leave the buffer.  State size is
  therefore O(rows within the watermark horizon) per key — bounded by
  the source's disorder, never by history.
* SPECULATIVE EMISSION — each batch also emits the fold of
  core ⊕ sorted(pending): the exact result over every row seen so
  far.  This is what makes the drained output complete WITHOUT a
  sentinel flush row: at query end the last emission per key already
  folds the whole input, even though the tail rows never finalized.

For the per-event family (bollinger / rolling corr) every batch emits
final rows for the newly-finalized events plus speculative rows for
the still-pending ones, each tagged with a per-key emission sequence
``nb``; a drained consumer keeps, per (user_id, event_id), the row
with the highest ``nb`` — an event's last emission is its exact value
(its finalization batch, or the final batch if it never finalized).

Exactness: both paths call the SAME pure kernels as the ordered folds
(``streaming/folds.py``), so the recurrences cannot drift; the
differential tests replay time-shuffled batches through the reorder
step and require bit-equality with the batch fold.
"""

from __future__ import annotations

from bisect import bisect_left

import pandas as pd

from .folds import (
    BOLLINGER_K,
    CORE_INIT,
    bollinger_kernel,
    corr_kernel,
    cusum_kernel,
    drawdown_kernel,
    ewma_kernel,
    ols_kernel,
    rsi_kernel,
)

__all__ = [
    "reordered_fold_stream",
    "reordered_bollinger_stream",
    "reordered_corr_stream",
    "REORDER_STATE_SCHEMAS",
]

_BUF_FIELDS = "bt ARRAY<BIGINT>, be ARRAY<BIGINT>, bv ARRAY<BIGINT>"

#: reorder-buffered state schemas: the ordered fold's fixed-width core
#: plus the pending-row parallel arrays (bounded by the watermark
#: horizon) — and, for the per-event family, the emission counter.
REORDER_STATE_SCHEMAS = {
    "cusum": (
        "anchor BIGINT, c BIGINT, m BIGINT, smax BIGINT, "
        "n_over BIGINT, alarm BIGINT, n BIGINT, " + _BUF_FIELDS
    ),
    "ewma": "ew BIGINT, n BIGINT, " + _BUF_FIELDS,
    "rsi": "prev_y BIGINT, ag BIGINT, al BIGINT, n BIGINT, " + _BUF_FIELDS,
    "ols": "n BIGINT, sy BIGINT, sxy BIGINT, syy BIGINT, " + _BUF_FIELDS,
    "drawdown": "eq BIGINT, peak BIGINT, dd BIGINT, n BIGINT, "
                + _BUF_FIELDS,
    "bollinger": "cnt BIGINT, " + ", ".join(
        f"v{i} BIGINT" for i in range(BOLLINGER_K - 1)
    ) + ", nb BIGINT, " + _BUF_FIELDS,
    "corr": "cnt BIGINT, prev_x BIGINT, " + ", ".join(
        f"x{i} BIGINT, y{i} BIGINT" for i in range(BOLLINGER_K - 1)
    ) + ", nb BIGINT, " + _BUF_FIELDS,
}

#: (kernel(core, ts_ns, eids, vals, kw) -> core, output columns, value col)
_STATE_KINDS = {
    "cusum": (
        lambda core, t, e, v, kw: cusum_kernel(core, v, e, **kw),
        ["anchor", "c", "m", "smax", "n_over", "alarm", "n"], "x",
    ),
    "ewma": (
        lambda core, t, e, v, kw: ewma_kernel(core, v, **kw),
        ["ew", "n"], "x",
    ),
    "rsi": (
        lambda core, t, e, v, kw: rsi_kernel(core, v, **kw),
        ["prev_y", "ag", "al", "n"], "y",
    ),
    "ols": (
        lambda core, t, e, v, kw: ols_kernel(core, v),
        ["n", "sy", "sxy", "syy"], "y",
    ),
    "drawdown": (
        lambda core, t, e, v, kw: drawdown_kernel(core, v),
        ["eq", "peak", "dd", "n"], "x",
    ),
}


def _merge_pending(state_tail, pdf: pd.DataFrame, vcol: str):
    """Merge the carried pending buffer with the batch's rows, sorted
    by (ts, event_id).  The carried buffer is ALREADY sorted (it is
    this function's own output from the previous batch), so only the
    new batch is sorted and the two runs are merged — O(carry +
    batch·log batch) per batch instead of re-sorting the whole horizon
    (r10 verdict item 6: a hot key at high event rate holds its full
    watermark horizon in the carry).  Times ride as int64
    epoch-nanoseconds (exact round-trip with pandas datetime64[ns])."""
    from heapq import merge as _heap_merge

    carry = zip(state_tail[0] or (), state_tail[1] or (),
                state_tail[2] or ())
    new = sorted(zip(pdf["ts"].astype("int64").tolist(),
                     pdf["event_id"].tolist(),
                     pdf[vcol].tolist()))
    merged = list(_heap_merge(carry, new))
    if not merged:
        return [], [], []
    bt, be, bv = (list(c) for c in zip(*merged))
    return bt, be, bv


def reorder_step(kind: str, core, buf, pdf: pd.DataFrame, wm_ns: int,
                 kw: dict):
    """Pure reorder step for the state-emission folds — exposed for
    Spark-free differential testing.  Returns (core', buf', emit_row):
    finalized rows folded into core, speculative row = fold over
    core' ⊕ pending."""
    kernel, cols, vcol = _STATE_KINDS[kind]
    bt, be, bv = _merge_pending(buf, pdf, vcol)
    cut = bisect_left(bt, wm_ns)
    if cut:
        core = kernel(core, bt[:cut], be[:cut], bv[:cut], kw)
        bt, be, bv = bt[cut:], be[cut:], bv[cut:]
    spec = kernel(core, bt, be, bv, kw)
    return core, (bt, be, bv), spec


def reordered_fold_stream(stream, kind: str, delay: str = "10 minutes",
                          **kw):
    """Reorder-buffered twin of the O(1) state-emission folds
    (``cusum`` / ``ewma`` / ``rsi`` / ``ols`` / ``drawdown``): exact for
    any cross-batch arrival disorder within ``delay``.  Output schema
    and the max-``n`` drained-final-row convention match the ordered
    fold, so the same oracle applies."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    kernel, cols, vcol = _STATE_KINDS[kind]
    init = CORE_INIT[kind]
    width = len(init)

    def fold(key, pdfs, state):
        uid = int(key[0])
        if state.exists:
            st = state.get
            core, tail = tuple(st[:width]), st[width:width + 3]
        else:
            core, tail = init, (None, None, None)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        core, (bt, be, bv), spec = reorder_step(
            kind, core, tail, pdf,
            state.getCurrentWatermarkMs() * 1_000_000, kw,
        )
        state.update((*core, bt, be, bv))
        yield pd.DataFrame(
            [spec], columns=cols, dtype=object
        ).assign(user_id=uid)

    out_schema = ", ".join(
        f"{c} BIGINT" for c in cols
    ) + ", user_id BIGINT"
    return (
        stream.withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=REORDER_STATE_SCHEMAS[kind],
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _ts_back(t_ns: list) -> list:
    return [pd.Timestamp(t) for t in t_ns]


def reorder_rows_step(kind: str, core, nb: int, buf, pdf: pd.DataFrame,
                      wm_ns: int, uid: int):
    """Pure reorder step for the per-event folds (``bollinger`` /
    ``corr``).  Returns (core', nb', buf', rows): final rows for the
    newly-finalized prefix + speculative rows for the pending tail,
    each tagged with the emission sequence ``nb'`` — the drained
    consumer keeps max-``nb`` per event."""
    bt, be, bv = _merge_pending(buf, pdf, "x")
    cut = bisect_left(bt, wm_ns)
    if kind == "bollinger":
        core, rows_final = bollinger_kernel(
            core, uid, _ts_back(bt[:cut]), be[:cut], bv[:cut])
        _, rows_spec = bollinger_kernel(
            core, uid, _ts_back(bt[cut:]), be[cut:], bv[cut:])
    elif kind == "corr":
        core, rows_final = corr_kernel(
            core, uid, _ts_back(bt[:cut]), be[:cut], bv[:cut])
        _, rows_spec = corr_kernel(
            core, uid, _ts_back(bt[cut:]), be[cut:], bv[cut:])
    else:  # pragma: no cover - guarded by callers
        raise ValueError(kind)
    nb += 1
    rows = [r + (nb,) for r in rows_final + rows_spec]
    return core, nb, (bt[cut:], be[cut:], bv[cut:]), rows


def reordered_bollinger_stream(stream, delay: str = "10 minutes"):
    """Reorder-buffered twin of ``bollinger_fold_stream``.  Emits the
    exact integer frame sums per event tagged with ``nb``; keep the
    max-``nb`` row per (user_id, event_id) after draining."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    k_carry = BOLLINGER_K - 1

    def fold(key, pdfs, state):
        uid = int(key[0])
        if state.exists:
            st = state.get
            cnt = st[0]
            core = [v for v in st[1:1 + cnt]]
            nb = st[1 + k_carry]
            tail = st[2 + k_carry:5 + k_carry]
        else:
            core, nb, tail = [], 0, (None, None, None)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        core, nb, (bt, be, bv), rows = reorder_rows_step(
            "bollinger", core, nb, tail, pdf,
            state.getCurrentWatermarkMs() * 1_000_000, uid,
        )
        state.update((
            len(core), *core, *([None] * (k_carry - len(core))),
            nb, bt, be, bv,
        ))
        yield pd.DataFrame(
            rows,
            columns=["user_id", "ts", "event_id", "n", "sx_c", "sxx_c4",
                     "nb"],
            dtype=object,
        )

    out_schema = (
        "user_id BIGINT, ts TIMESTAMP, event_id BIGINT, "
        "n BIGINT, sx_c BIGINT, sxx_c4 BIGINT, nb BIGINT"
    )
    return (
        stream.withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=REORDER_STATE_SCHEMAS["bollinger"],
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def reordered_corr_stream(stream, delay: str = "10 minutes"):
    """Reorder-buffered twin of ``corr_fold_stream`` (same drained
    max-``nb`` convention as :func:`reordered_bollinger_stream`)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    k_carry = BOLLINGER_K - 1

    def fold(key, pdfs, state):
        uid = int(key[0])
        if state.exists:
            st = state.get
            cnt, prev_x = st[0], st[1]
            flat = st[2:2 + 2 * cnt]
            buf = [(flat[2 * i], flat[2 * i + 1]) for i in range(cnt)]
            nb = st[2 + 2 * k_carry]
            tail = st[3 + 2 * k_carry:6 + 2 * k_carry]
        else:
            prev_x, buf, nb, tail = None, [], 0, (None, None, None)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        (prev_x, buf), nb, (bt, be, bv), rows = reorder_rows_step(
            "corr", (prev_x, buf), nb, tail, pdf,
            state.getCurrentWatermarkMs() * 1_000_000, uid,
        )
        flat_out: list = []
        for a, b in buf:
            flat_out.extend((a, b))
        flat_out.extend([None] * (2 * (k_carry - len(buf))))
        state.update((len(buf), prev_x, *flat_out, nb, bt, be, bv))
        yield pd.DataFrame(
            rows,
            columns=["user_id", "ts", "event_id", "n",
                     "sx_c", "sy_c", "sxy_c4", "sxx_c4", "syy_c4", "nb"],
            dtype=object,
        )

    out_schema = (
        "user_id BIGINT, ts TIMESTAMP, event_id BIGINT, n BIGINT, "
        "sx_c BIGINT, sy_c BIGINT, sxy_c4 BIGINT, sxx_c4 BIGINT, "
        "syy_c4 BIGINT, nb BIGINT"
    )
    return (
        stream.withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=REORDER_STATE_SCHEMAS["corr"],
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
