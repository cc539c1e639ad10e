"""Stream merging: positional zip (fixture fidelity) and last-value merge.

* ``positional_zip`` ports ``merge_timeseries``
  (``/root/reference/examples/common.py:18-22``): K series aligned *by
  position, not timestamp*; row *i* takes series 1's i-th timestamp; output
  stops at the shortest series (Python ``zip``).  Kept for fixture fidelity
  only -- SURVEY §2 B2.
* ``last_value_merge`` is the *intended* csp semantics (the workhorse, B2'):
  union all streams on the global ``(ts, seq)`` order and carry each
  stream's latest value forward, so every event sees the freshest value of
  every other stream (the pattern behind e2_ticking.py:10-27,
  e3_show_graph.py:11-29 and the Book of e4_trade_pnl.py:36-70).

Scale note: both use ordered windows; pass ``partition_by`` (instrument,
user, ...) whenever the query has a key so the sort is per-partition.  The
reference is single-stream-per-callback anyway, so keyed use is the norm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.event_relation import SEQ, TS, merge_streams


def positional_zip(named_streams: dict[str, DataFrame], value_col: str = "value") -> DataFrame:
    """Row *i* of output = ``{name_k: series_k[i].value}`` at series-1's ts.

    Implemented as per-series ``row_number`` + inner joins on the row index
    (inner join == ``zip``'s stop-at-shortest).  At scale this is a K-way
    co-partitioned join on ``rn``.
    """
    names = list(named_streams)
    out = None
    for i, name in enumerate(names):
        s = named_streams[name]
        w = Window.orderBy(F.col(TS), F.col(SEQ))
        cols = [F.row_number().over(w).cast("long").alias("rn"), F.col(value_col).alias(name)]
        if i == 0:
            cols.insert(1, F.col(TS))
        s = s.select(*cols)
        out = s if out is None else out.join(s, "rn", "inner")
    return out.select("rn", TS, *names)


def last_value_merge(
    named_streams: dict[str, DataFrame],
    value_col: str = "value",
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Union K streams; carry each stream's last value forward in global
    ``(ts, seq)`` order.  Output has one row per input event with columns
    ``ts, seq, <name_1> .. <name_k>`` holding the freshest value of each
    stream as of that event (nulls until a stream first ticks)."""
    keys = partition_by or []
    tagged = []
    for i, (name, s) in enumerate(named_streams.items()):
        tagged.append(
            s.select(
                *[F.col(k) for k in keys],
                F.col(TS),
                F.col(SEQ),
                F.col(value_col).alias(name),
            )
        )
    merged = merge_streams(*tagged)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(TS), F.col(SEQ))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for name in named_streams:
        merged = merged.withColumn(name, F.last(name, ignorenulls=True).over(w))
    return merged


def positional_index(df: DataFrame, idx_col: str = "pos") -> DataFrame:
    """Contiguous 0-based position per row WITHOUT a global sort -- the
    scale path for positional semantics (the zipWithIndex shape, in
    DataFrame ops).

    A global ``row_number()`` funnels the whole relation through ONE
    task; this instead (1) counts rows per input partition with a
    metadata-sized ``mapInPandas`` pass (one output row per partition),
    (2) cumsums the counts on the driver (O(#partitions) model state),
    and (3) assigns ``offset[pid] + local_position`` in a second narrow
    pass.  Order contract: positions follow Spark's partition order and
    in-partition row order -- deterministic for file sources (sorted
    file listing, fixed in-file row order), i.e. exactly the order a
    single-threaded reader would see.  Two scans instead of one sort;
    at 100 TB the sort is impossible and the scans are linear.

    Property-tested against the single-partition ``row_number`` ground
    truth (tests/test_operators.py).
    """
    import pandas as pd

    fields = df.schema.fieldNames()

    def count_rows(it):
        n = 0
        pid = -1
        for b in it:
            if len(b):
                pid = int(b["__pid"].iloc[0])
                n += len(b)
        if n:
            yield pd.DataFrame({"pid": [pid], "n": [n]})

    with_pid = df.withColumn("__pid", F.spark_partition_id())
    counts = {
        r["pid"]: r["n"]
        for r in with_pid.mapInPandas(count_rows, "pid int, n long").collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    def assign(it):
        local = {}
        for b in it:
            if not len(b):
                continue
            pid = int(b["__pid"].iloc[0])
            start = offsets.get(pid, 0) + local.get(pid, 0)
            local[pid] = local.get(pid, 0) + len(b)
            out = b.drop(columns=["__pid"]).copy()
            out[idx_col] = range(start, start + len(b))
            yield out

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields) + f", {idx_col} bigint"
    return with_pid.mapInPandas(assign, schema).select(*fields, idx_col)
