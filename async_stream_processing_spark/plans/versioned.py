"""Manifest-based versioned lake: snapshot isolation + time travel.

The minimal transactional-lake core (the Iceberg/Delta idea reduced to
its load-bearing mechanism) for pipelines that re-run, backfill and
audit at 100 TB:

* **Data files are immutable**; every commit writes NEW parquet files
  under ``<lake>/data/`` and then publishes ONE manifest JSON listing
  every file visible in that version.  The manifest publish is an
  atomic ``O_CREAT|O_EXCL`` create -- the single commit point.
* **Readers never list the data directory.**  They read a manifest and
  load exactly its files, so a crashed or in-flight writer's orphan
  files are invisible (snapshot isolation), and reading ``version=N``
  after later commits reproduces the exact bytes of version N (time
  travel -- the "which corpus snapshot trained this model" answer).
* **Concurrent committers race on the version file**: the loser's
  ``O_EXCL`` create fails and the commit retries against the new head
  (optimistic concurrency, append-only semantics make the retry safe).
* **vacuum** deletes data files referenced by no kept manifest --
  storage reclamation is decoupled from logical deletes.

Scale notes: a manifest here is a flat JSON file list; at real scale
the same structure nests (manifest-of-manifests) so a commit appends
O(1) metadata instead of rewriting the file list -- the mechanism
(immutable data + atomic manifest swap + pinned-version reads) is
identical.  Reference parity: the reference engine has no storage
layer; this is part of the lake surface the 100 TB posture requires
(compact_lake, write_partitioned_lake, write_bucketed are the
siblings in ``plans/scale.py``).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, _MANIFEST_DIR, f"v{version:09d}.json")


def versions(path: str) -> list[int]:
    """Committed version numbers, ascending (empty for a fresh lake)."""
    mdir = os.path.join(path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for f in os.listdir(mdir):
        if f.startswith("v") and f.endswith(".json"):
            out.append(int(f[1:-5]))
    return sorted(out)


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as f:
        return json.load(f)


def _is_torn(path: str, version: int) -> bool:
    """A writer that died between claiming the version file (O_EXCL)
    and writing its body leaves a torn manifest: the version NUMBER is
    burned (later committers skip past it) but the snapshot never
    became visible.  Readers treat it as absent."""
    try:
        _read_manifest(path, version)
        return False
    except (json.JSONDecodeError, OSError):
        return True


def _write_data(df: DataFrame, path: str) -> list[str]:
    """Write df's parquet files under data/<uuid>/ and return their
    lake-relative paths.  The directory is invisible to readers until a
    manifest references it."""
    token = uuid.uuid4().hex
    target = os.path.join(path, _DATA_DIR, token)
    df.write.mode("error").parquet(target)
    rel = []
    for dp, _, fs in os.walk(target):
        for f in fs:
            if f.endswith(".parquet"):
                rel.append(
                    os.path.relpath(os.path.join(dp, f), path)
                )
    return sorted(rel)


def _commit(path: str, files: list[str], parent: int | None,
            operation: str, max_retries: int = 20,
            meta: dict | None = None) -> int:
    """Publish a manifest atomically; on a version-number race, retry
    against the new head (safe: ``files`` already embeds the intended
    base -- append recomputes it per attempt via the caller loop, so
    only overwrite commits and first-writer appends land here)."""
    os.makedirs(os.path.join(path, _MANIFEST_DIR), exist_ok=True)
    for _ in range(max_retries):
        vs = versions(path)
        v = (vs[-1] if vs else 0) + 1
        body = {
            "version": v,
            "parent": parent if parent is not None else (vs[-1] if vs else None),
            "operation": operation,
            "files": files,
            **(meta or {}),
        }
        try:
            fd = os.open(
                _manifest_path(path, v),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            continue  # lost the race; retry against the new head
        with os.fdopen(fd, "w") as f:
            json.dump(body, f)
        return v
    raise RuntimeError(f"commit contention: {max_retries} retries exhausted")


def _footer_stats(abs_path: str, cols: list[str]) -> dict:
    """Per-column [min, max] from the parquet FOOTER (zero data read),
    aggregated across row groups.  Columns without statistics are
    omitted (a reader must then treat the file as unprunable)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(abs_path).metadata
    out: dict = {}
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        for i in range(rg.num_columns):
            c = rg.column(i)
            name = c.path_in_schema
            if name not in cols:
                continue
            st = c.statistics
            if st is None or not st.has_min_max:
                out[name] = None  # poison: stats unusable for this file
                continue
            lo, hi = st.min, st.max
            if name in out and out[name] is not None:
                lo = min(lo, out[name][0])
                hi = max(hi, out[name][1])
            if out.get(name, True) is not None:
                out[name] = [lo, hi]
    return {k: v for k, v in out.items() if v is not None}


def _bloom_probes(values, m_bits: int, k: int):
    """Kirsch-Mitzenmacher probe rows for int64 values, after a
    splitmix-style scramble (raw ids are sequential; unscrambled h2
    would degenerate to 1).  Pure driver-side numpy — the bloom never
    crosses an engine boundary, so there is no portability constraint."""
    import numpy as np

    v = np.asarray(values, dtype=np.uint64)
    h = (v * np.uint64(0x9E3779B97F4A7C15)) & np.uint64((1 << 63) - 1)
    h ^= h >> np.uint64(31)
    h1 = h % np.uint64(m_bits)
    h2 = ((h >> np.uint64(17)) | np.uint64(1)) % np.uint64(m_bits)
    return h1, h2


def _build_file_bloom(abs_path: str, col: str,
                      m_bits: int, k: int) -> str:
    """Bloom filter over one file's ``col`` values, base64-packed.
    Costs one single-column read of a freshly written file at commit
    time (an in-flight writer would fold this into the write itself;
    same artifact)."""
    import base64

    import numpy as np
    import pyarrow.parquet as pq

    vals = pq.read_table(abs_path, columns=[col])[col].to_numpy()
    bits = np.zeros(m_bits, dtype=bool)
    h1, h2 = _bloom_probes(vals, m_bits, k)
    for i in range(k):
        bits[(h1 + np.uint64(i) * h2) % np.uint64(m_bits)] = True
    return base64.b64encode(np.packbits(bits).tobytes()).decode()


def _bloom_might_contain(entry: dict, value: int) -> bool:
    import base64

    import numpy as np

    bits = np.unpackbits(
        np.frombuffer(base64.b64decode(entry["b64"]), dtype=np.uint8)
    )
    m, k = entry["m"], entry["k"]
    h1, h2 = _bloom_probes([value], m, k)
    return all(
        bits[int((h1[0] + np.uint64(i) * h2[0]) % np.uint64(m))]
        for i in range(k)
    )


def commit_append(
    df: DataFrame, path: str, meta: dict | None = None,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    bloom_bits: int = 1 << 16,
    bloom_k: int = 4,
) -> int:
    """Append ``df`` as a new version: new data files + a manifest that
    is (head's files + new files).  With ``stats_cols``, each new
    file's footer min/max for those columns is recorded in the manifest
    (``stats`` map) so :func:`scan_version` can skip files by range —
    the Iceberg scan-planning idea: pruning decisions from O(#files)
    manifest metadata, zero data reads.  Returns the committed
    version."""
    new_files = _write_data(df, path)
    stats = {}
    if stats_cols:
        for f in new_files:
            s = _footer_stats(os.path.join(path, f), stats_cols)
            if s:
                stats[f] = s
    blooms = {}
    if bloom_cols:
        for f in new_files:
            blooms[f] = {
                c: {"m": bloom_bits, "k": bloom_k,
                    "b64": _build_file_bloom(
                        os.path.join(path, f), c, bloom_bits, bloom_k)}
                for c in bloom_cols
            }
    while True:
        vs = [v for v in versions(path) if not _is_torn(path, v)]
        base_files, base_stats, base_blooms = [], {}, {}
        if vs:
            m = _read_manifest(path, vs[-1])
            base_files = m["files"]
            base_stats = m.get("stats", {})
            base_blooms = m.get("blooms", {})
        extra = {}
        if stats or base_stats:
            extra["stats"] = {**base_stats, **stats}
        if blooms or base_blooms:
            extra["blooms"] = {**base_blooms, **blooms}
        try:
            return _commit(
                path, sorted(base_files) + new_files,
                parent=vs[-1] if vs else None,
                operation="append", max_retries=1,
                meta={**extra, **(meta or {})},
            )
        except RuntimeError:
            continue  # head moved between the base read and the publish


def commit_overwrite(df: DataFrame, path: str) -> int:
    """Replace the logical table content with ``df`` (a new version; old
    versions stay readable until vacuumed)."""
    new_files = _write_data(df, path)
    return _commit(path, new_files, parent=None, operation="overwrite")


def read_version(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Load a pinned version (default: head).  Reads exactly the
    manifest's files -- orphan / in-flight files never appear.

    ``merge_schema=True`` unions file schemas across commits (schema
    evolution: rows from before a column existed read as NULL) -- the
    footer-merge pass costs one metadata read per file, so at real
    scale the merged schema would be cached in the manifest instead."""
    vs = [v for v in versions(path) if not _is_torn(path, v)]
    if not vs:
        raise FileNotFoundError(f"no committed versions under {path}")
    v = vs[-1] if version is None else version
    m = _read_manifest(path, v)
    if not m["files"]:
        raise ValueError(f"version {v} is empty")
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*[os.path.join(path, f) for f in m["files"]])


def table_changes(
    spark: SparkSession, path: str, v_from: int, v_to: int
) -> DataFrame:
    """Change-data-feed between two committed versions, at FILE
    granularity (the Delta CDF idea without row tracking): rows in
    files added by (v_from, v_to] surface as ``_change_type='insert'``,
    rows in files dropped as ``'delete'``.  Reads ONLY the differenced
    files -- a version diff touches O(changed data), never the table.

    File granularity means a copy-on-write MERGE reports a rewritten
    file's carried rows as delete+insert pairs (self-cancelling churn a
    row-tracking CDF would suppress); append-only histories produce
    exact row-level inserts.  Consumers folding the feed by key get the
    correct net state either way."""
    from pyspark.sql import functions as F

    for v in (v_from, v_to):
        if _is_torn(path, v):
            raise ValueError(f"version {v} is torn/absent")
    f_from = set(_read_manifest(path, v_from)["files"])
    f_to = set(_read_manifest(path, v_to)["files"])
    added = sorted(f_to - f_from)
    removed = sorted(f_from - f_to)

    def _read(files: list[str], tag: str) -> DataFrame | None:
        if not files:
            return None
        return spark.read.parquet(
            *[os.path.join(path, f) for f in files]
        ).withColumn("_change_type", F.lit(tag))

    ins, dels = _read(added, "insert"), _read(removed, "delete")
    if ins is not None and dels is not None:
        return ins.unionByName(dels)
    if ins is not None:
        return ins
    if dels is not None:
        return dels
    # identical file sets: empty feed with the head's schema
    return read_version(spark, path, v_to).limit(0).withColumn(
        "_change_type", F.lit("insert")
    )


def scan_version(
    spark: SparkSession,
    path: str,
    col: str | None = None,
    lo=None,
    hi=None,
    version: int | None = None,
    ranges: dict | None = None,
) -> DataFrame:
    """Range-pruned read of a pinned version: opens ONLY the manifest
    files whose recorded [min, max] intersects the queried range(s)
    (files without recorded stats are conservatively kept), then
    applies the range filter so the result is exact either way.  The
    pruning decision costs one manifest read — no file footers, no data
    — which is what makes a needle query against a 10^5-file snapshot
    a metadata operation (proven by a corrupt-the-other-files test).

    Single predicate: ``scan_version(spark, path, col, lo, hi)``.
    Conjunction: ``scan_version(spark, path, ranges={"a": (lo, hi),
    "b": (lo, hi)})`` — a file survives only if EVERY queried column's
    recorded range intersects (AND-pruning: Z-order/Hilbert-clustered
    layouts make multi-column conjunctions prune multiplicatively)."""
    from pyspark.sql import functions as F

    if ranges is None:
        ranges = {col: (lo, hi)}
    vs = [v for v in versions(path) if not _is_torn(path, v)]
    if not vs:
        raise FileNotFoundError(f"no committed versions under {path}")
    v = vs[-1] if version is None else version
    m = _read_manifest(path, v)
    stats = m.get("stats", {})
    keep = []
    for f in m["files"]:
        ok = True
        for c, (c_lo, c_hi) in ranges.items():
            s = stats.get(f, {}).get(c)
            if s is not None and not (s[0] <= c_hi and s[1] >= c_lo):
                ok = False
                break
        if ok:
            keep.append(f)

    def _filtered(df: DataFrame) -> DataFrame:
        for c, (c_lo, c_hi) in ranges.items():
            df = df.filter(F.col(c).between(c_lo, c_hi))
        return df

    if not keep:
        return _filtered(read_version(spark, path, v).limit(0))
    return _filtered(
        spark.read.parquet(*[os.path.join(path, f) for f in keep])
    )


def lookup_version(
    spark: SparkSession,
    path: str,
    col: str,
    value: int,
    version: int | None = None,
) -> DataFrame:
    """Point lookup against a pinned version via the manifest's
    per-file BLOOM filters: only files whose bloom might contain
    ``value`` are opened (no false negatives by construction, so the
    equality filter on top makes the result exact; files without a
    bloom are conservatively kept).  The row-level twin of
    :func:`scan_version`'s range pruning — a primary-key fetch against
    a 10^5-file snapshot touches O(1) files."""
    from pyspark.sql import functions as F

    vs = [v for v in versions(path) if not _is_torn(path, v)]
    if not vs:
        raise FileNotFoundError(f"no committed versions under {path}")
    v = vs[-1] if version is None else version
    m = _read_manifest(path, v)
    blooms = m.get("blooms", {})
    keep = []
    for f in m["files"]:
        entry = blooms.get(f, {}).get(col)
        if entry is None or _bloom_might_contain(entry, value):
            keep.append(f)
    if not keep:
        return read_version(spark, path, v).limit(0).filter(
            F.col(col) == value
        )
    df = spark.read.parquet(*[os.path.join(path, f) for f in keep])
    return df.filter(F.col(col) == value)


def vacuum(path: str, keep_last: int = 1) -> dict:
    """Delete data files referenced by none of the last ``keep_last``
    manifests (and drop the older manifests).  Returns counts for
    observability."""
    all_vs = versions(path)
    vs = [v for v in all_vs if not _is_torn(path, v)]
    keep = vs[-keep_last:] if keep_last > 0 else []
    live: set[str] = set()
    for v in keep:
        live.update(_read_manifest(path, v)["files"])
    removed = 0
    droot = os.path.join(path, _DATA_DIR)
    for dp, _, fs in os.walk(droot):
        for f in fs:
            full = os.path.join(dp, f)
            rel = os.path.relpath(full, path)
            if f.endswith(".parquet") and rel not in live:
                os.remove(full)
                removed += 1
    # drop empty data dirs + superseded manifests
    for dp, dirs, fs in os.walk(droot, topdown=False):
        if not dirs and not fs and dp != droot:
            shutil.rmtree(dp, ignore_errors=True)
    for v in all_vs:
        if v not in keep:
            os.remove(_manifest_path(path, v))
    return {"versions_kept": keep, "files_removed": removed}


def merge_into(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
    meta: dict | None = None,
) -> int:
    """MERGE a change batch into the lake head as ONE new version —
    the Delta/Iceberg copy-on-write MERGE reduced to its mechanism:

    * WHEN MATCHED (by ``key_cols``) → the target row is REPLACED by
      the source row (update), or DROPPED if the source row's
      ``delete_col`` is true (delete).
    * WHEN NOT MATCHED → the source row is INSERTED (unless flagged
      for delete, which is then a no-op).

    Copy-on-write at FILE granularity — the 100 TB posture:

    1. Find the TOUCHED files: one narrow scan of the head tagged with
       ``input_file_name`` semi-joined (broadcast — a CDC batch is the
       small side) against the source keys.  Only files that actually
       contain a matched key are rewritten.
    2. Rewrite = touched files' rows with matched keys removed, UNION
       the surviving source rows.  Untouched files are carried into the
       new manifest BY REFERENCE — zero bytes moved or rewritten for
       them (tested: their relative paths survive verbatim).
    3. Commit = one atomic manifest publish; the pre-merge version
       stays time-travel-readable until vacuumed.

    A key appearing twice in ``source`` is a caller error (the merge
    would be order-dependent); enforced with one cheap count.  A key
    appearing twice in the TARGET (not the intended keyed-table shape)
    collapses to the single source row on update — Delta would instead
    rewrite every matched row to the same values; the collapse is the
    saner semantics for a keyed lake and is documented rather than
    hidden.  Returns the committed version."""
    from pyspark.sql import functions as F

    vs = [v for v in versions(path) if not _is_torn(path, v)]
    if not vs:
        raise FileNotFoundError(f"no committed versions under {path}")
    head = vs[-1]
    head_files = _read_manifest(path, head)["files"]

    dup = (
        source.groupBy(*key_cols).count().filter(F.col("count") > 1).limit(1)
    )
    if dup.count() > 0:
        raise ValueError("merge source has duplicate keys")

    data_cols = [c for c in source.columns if c != delete_col]
    src_keys = source.select(*key_cols)

    # 0. manifest-stat pre-prune: a file whose recorded key range
    # cannot intersect the CDC batch's key span cannot contain a match
    # — at 100 TB this turns the touched-file scan from a full head
    # read into O(candidate files) (stats are per single key column;
    # composite keys or stat-less files degrade to scanning all).
    head_manifest = _read_manifest(path, head)
    stats = head_manifest.get("stats", {})
    candidates = head_files
    if len(key_cols) == 1:
        kc = key_cols[0]
        bounds = source.agg(
            F.min(kc).alias("lo"), F.max(kc).alias("hi")
        ).first()
        if bounds["lo"] is not None:
            candidates = [
                f for f in head_files
                if stats.get(f, {}).get(kc) is None
                or (stats[f][kc][0] <= bounds["hi"]
                    and stats[f][kc][1] >= bounds["lo"])
            ]
    if not candidates:
        touched_abs = []
        target = None
    else:
        target = spark.read.parquet(
            *[os.path.join(path, f) for f in candidates]
        ).withColumn("_file", F.input_file_name())

        # 1. touched files: those containing at least one matched key
        touched_abs = [
            r["_file"]
            for r in target.join(
                F.broadcast(src_keys), key_cols, "left_semi"
            ).select("_file").distinct().collect()
        ]
    # input_file_name yields URIs (file://...); map back to lake-relative
    touched_rel = set()
    for uri in touched_abs:
        p = uri[7:] if uri.startswith("file://") else (
            uri[5:] if uri.startswith("file:") else uri)
        touched_rel.add(os.path.relpath(p, os.path.abspath(path)))
    kept = [f for f in head_files if f not in touched_rel]

    # 2. rewrite: survivors of touched files + surviving source rows
    upserts = (
        source.filter(~F.col(delete_col)) if delete_col is not None
        else source
    ).select(*data_cols)
    if touched_rel:
        touched_rows = spark.read.parquet(
            *[os.path.join(path, f) for f in sorted(touched_rel)]
        ).select(*data_cols)
        survivors = touched_rows.join(
            F.broadcast(src_keys), key_cols, "left_anti"
        )
        rewrite = survivors.unionByName(upserts)
    else:
        rewrite = upserts
    new_files = _write_data(rewrite, path)

    # 3. one atomic commit; pre-merge head stays readable.  Stats are
    # carried for kept files and recomputed (same columns) for the
    # rewritten files, so merge does not degrade future stat pruning.
    extra = {}
    if stats:
        stat_cols = sorted({c for s in stats.values() for c in s})
        new_stats = {f: stats[f] for f in kept if f in stats}
        for f in new_files:
            s = _footer_stats(os.path.join(path, f), stat_cols)
            if s:
                new_stats[f] = s
        extra["stats"] = new_stats
    blooms = head_manifest.get("blooms", {})
    if blooms:
        any_entry = next(iter(blooms.values()))
        bloom_cols = sorted(any_entry)
        m_bits = any_entry[bloom_cols[0]]["m"]
        k_probes = any_entry[bloom_cols[0]]["k"]
        new_blooms = {f: blooms[f] for f in kept if f in blooms}
        for f in new_files:
            new_blooms[f] = {
                c: {"m": m_bits, "k": k_probes,
                    "b64": _build_file_bloom(
                        os.path.join(path, f), c, m_bits, k_probes)}
                for c in bloom_cols
            }
        extra["blooms"] = new_blooms
    return _commit(
        path, sorted(kept) + new_files, parent=head, operation="merge",
        meta={"touched_files": len(touched_rel),
              "carried_files": len(kept), **extra, **(meta or {})},
    )


def compact(spark: SparkSession, path: str, target_files: int = 1) -> int:
    """OPTIMIZE: rewrite the head's files into ``target_files`` larger
    ones as a new version — content logically identical, old version
    still time-travel-readable, small files reclaimed by vacuum.  The
    coalesce is shuffle-free (file-level re-bin, not a repartition).
    Stats and blooms are recomputed for the rewritten files when the
    head carried them, so maintenance never degrades pruning."""
    df = read_version(spark, path).coalesce(target_files)
    new_files = _write_data(df, path)
    vs = [v for v in versions(path) if not _is_torn(path, v)]
    m = _read_manifest(path, vs[-1])
    extra: dict = {}
    if m.get("stats"):
        stat_cols = sorted({c for s in m["stats"].values() for c in s})
        extra["stats"] = {
            f: s for f in new_files
            if (s := _footer_stats(os.path.join(path, f), stat_cols))
        }
    if m.get("blooms"):
        any_entry = next(iter(m["blooms"].values()))
        bloom_cols = sorted(any_entry)
        mb = any_entry[bloom_cols[0]]["m"]
        kp = any_entry[bloom_cols[0]]["k"]
        extra["blooms"] = {
            f: {c: {"m": mb, "k": kp,
                    "b64": _build_file_bloom(
                        os.path.join(path, f), c, mb, kp)}
                for c in bloom_cols}
            for f in new_files
        }
    return _commit(
        path, new_files, parent=vs[-1], operation="compact", meta=extra
    )


def committed_batch_ids(path: str) -> set[int]:
    """Streaming batch ids already committed to this lake (manifests
    carry ``batch_id`` when written by :func:`versioned_sink`)."""
    out = set()
    for v in versions(path):
        if _is_torn(path, v):
            continue
        b = _read_manifest(path, v).get("batch_id")
        if b is not None:
            out.add(int(b))
    return out


def versioned_sink(stream_df: DataFrame, path: str, checkpoint: str):
    """EXACTLY-ONCE streaming append into the versioned lake: each
    micro-batch commits as one version whose manifest records its
    ``batch_id``; a re-delivered batch (foreachBatch's at-least-once
    contract after a crash or checkpoint restart) finds its id already
    committed and SKIPS -- the Delta txn-version recipe.  A writer that
    died between data write and manifest publish leaves only orphan
    files, which no reader ever sees, so the retry is safe, not merely
    idempotent-by-overwrite (the ``streaming/upsert`` discipline,
    without needing a keyed merge).

    Returns the started StreamingQuery (caller awaits/stops it)."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in committed_batch_ids(path):
            return
        commit_append(batch_df, path, meta={"batch_id": batch_id})

    return (
        stream_df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def versioned_merge_sink(
    stream_df: DataFrame,
    path: str,
    key_cols: list[str],
    checkpoint: str,
    delete_col: str | None = None,
):
    """Streaming CDC APPLY into the versioned lake: every micro-batch
    MERGEs (update/delete/insert by key, copy-on-write at file
    granularity) as one version whose manifest records its ``batch_id``
    -- so a re-delivered batch after a crash/checkpoint-restart finds
    its id committed and SKIPS (the versioned_sink exactly-once recipe,
    now for keyed mutations, i.e. the Delta streaming MERGE shape).
    Cross-batch composition is exact as long as one batch does not
    carry two rows for the same key (merge_into enforces per batch).

    Returns the started StreamingQuery (caller awaits/stops it)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in committed_batch_ids(path):
            return
        if not batch_df.take(1):
            return  # empty trigger: no version burned
        merge_into(
            batch_df.sparkSession, path, batch_df, key_cols,
            delete_col=delete_col, meta={"batch_id": batch_id},
        )

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
