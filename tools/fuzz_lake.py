"""Lake-lifecycle differential fuzzer: random transactional op
sequences executed by the versioned lake AND by a plain Python dict
model, compared exactly after every commit — the sequence-level
adversary for the transactional layer (the relational fuzzer's sibling:
``fuzz_differential.py`` probes query space; this probes COMMIT space).

Each case runs a seeded random sequence of:

* ``append``  — new keyed rows (commit_append, stats+blooms tracked)
* ``merge``   — update/delete/insert CDC batch (merge_into, CoW)
* ``compact`` — OPTIMIZE (plain or ZORDER-clustered)
* ``vacuum``  — drop history beyond a random keep-last
* ``clone``   — zero-copy shallow clone; the walk CONTINUES ON THE
  CLONE (source snapshot is pinned in the model and re-checked at the
  end — proves clone independence over arbitrary later mutations)
* ``delete``  — DELETE WHERE over a random k-range / v-threshold /
  v-modulus predicate (delete_where, CoW, stat-pruned); the model
  drops the same keys via the same predicate in Python
* ``mor_delete`` — the same predicate shapes through deletion vectors
  (``mode="mor"``): no file rewritten, readers anti-join dead
  positions; the walk's later merges/compacts/restores/vacuums then
  exercise DV carry, materialization and reclamation against the model
* ``mor_update`` — DV-backed UPDATE: preimage positions die via a DV,
  postimages append as a new file; same affine map in the model
* ``update``  — UPDATE SET v = a*v + b WHERE a random predicate
  (update_where; every RHS reads the OLD row); model applies the same
  affine map to matching entries
* ``restore`` — re-publish a random earlier version as a NEW head
  (Delta RESTORE); the model rolls back to that version's snapshot,
  and the walk continues on top.  Restoring to a version whose files
  were vacuumed must REFUSE (FileNotFoundError) and leave state
  unchanged — both paths exercised.

After every commit the head must equal the model (full multiset
compare); a random pinned snapshot is re-read later (time travel under
churn); point lookups through the bloom path must agree with the model.

Usage: python tools/fuzz_lake.py [n_cases] [seed]
Also driven by tests/test_scale.py with pinned seeds.
"""

from __future__ import annotations

import random
import shutil
import sys
import tempfile

sys.path.insert(0, ".")


def run_case(spark, rng: random.Random, n_ops: int = 8) -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from async_stream_processing_spark.plans.versioned import (
        checkpoint_manifest,
        commit_append,
        compact,
        delete_where,
        lookup_version,
        merge_into,
        read_version,
        restore,
        scan_version,
        shallow_clone,
        update_where,
        vacuum,
        versions,
    )

    root = tempfile.mkdtemp(prefix="asp_lakefuzz_")
    lake = root + "/lake"
    clones = 0
    model: dict[int, int] = {}  # k -> v (keyed table semantics)
    next_k = 0
    # (path, version, snapshot) pins re-checked at the end; for a clone
    # the snapshot is the SOURCE state at clone time
    pins: list[tuple[str, int, dict[int, int]]] = []
    # per-version snapshots of the CURRENT lake (restore targets)
    snaps: dict[int, dict[int, int]] = {}

    def fresh_rows(n):
        nonlocal next_k
        rows = [(next_k + i, rng.randrange(1000)) for i in range(n)]
        next_k += n
        return rows

    def df_of(rows, with_flag=False):
        if with_flag:
            return spark.createDataFrame(
                [(k, v, bool(d)) for (k, v, d) in rows],
                "k long, v long, is_delete boolean",
            )
        return spark.createDataFrame(rows, "k long, v long")

    def check_head():
        got = {(r["k"], r["v"]) for r in read_version(spark, lake).collect()}
        want = set(model.items())
        assert got == want, (
            f"head mismatch: extra={got - want} missing={want - got}"
        )

    # seed the lake
    rows = fresh_rows(rng.randrange(5, 30))
    model.update(dict(rows))
    commit_append(df_of(rows).coalesce(1), lake,
                  stats_cols=["k"], bloom_cols=["k"], bloom_bits=1 << 12)
    check_head()
    snaps[versions(lake)[-1]] = dict(model)

    for _ in range(n_ops):
        op = rng.choice(
            ["append", "append", "merge", "merge", "compact", "vacuum",
             "clone", "pin", "restore", "delete", "update", "mor_delete",
             "mor_update", "ckpt_scan", "mv_follow"]
        )
        if op == "mv_follow":
            # incremental-MV adversary (plans/mv.py): seed a grouped
            # count/sum view at a random LIVE earlier version, advance
            # it to the head by folding ONLY the row-level change feed
            # across whatever ops the walk did in between (merge / CoW
            # + DV DML / compact — whose row-level delta must net to
            # zero — / restore), and demand it equals the model's
            # aggregate exactly.  Single jump always legal (endpoints
            # live); stepping requires every intermediate manifest
            # alive (vacuum may have reaped some).
            from async_stream_processing_spark.plans.mv import (
                maintain_view,
                sum_count_view,
            )

            all_live = versions(lake)
            live = [v for v in all_live if v in snaps]
            head = all_live[-1]
            cand = [v for v in live if v < head]
            if cand:
                v0 = rng.choice(cand)
                grp = lambda df: df.withColumn(  # noqa: E731
                    "g", F.pmod(F.col("k"), F.lit(5)).cast("long")
                )
                base = sum_count_view(
                    grp(read_version(spark, lake, v0)), ["g"], "v"
                )
                contiguous = all(v in all_live for v in range(v0, head + 1))
                step = 1 if (contiguous and rng.random() < 0.5) \
                    else head - v0
                mv = maintain_view(spark, lake, base, ["g"], "v",
                                   v0, head, step=step, prepare=grp)
                got = {(r["g"], r["n_rows"], r["sum_m"])
                       for r in mv.collect()}
                want_agg: dict[int, list[int]] = {}
                for k, vv in model.items():
                    e = want_agg.setdefault(k % 5, [0, 0])
                    e[0] += 1
                    e[1] += vv
                want = {(g, n, s) for g, (n, s) in want_agg.items()}
                assert got == want, (v0, head, step, got ^ want)
            check_head()
            snaps[versions(lake)[-1]] = dict(model)
            continue
        if op == "ckpt_scan":
            # parquet manifest checkpoint: the DISTRIBUTED pruned scan
            # must agree with the model (and with the JSON-loop path,
            # which a pre-checkpoint scan_version would have used)
            v = checkpoint_manifest(spark, lake)
            a = rng.randrange(0, max(next_k, 1))
            b = a + rng.randrange(1, 30)
            got = {(r["k"], r["v"])
                   for r in scan_version(spark, lake, "k", a, b,
                                         version=v).collect()}
            want = {(k, vv) for k, vv in model.items() if a <= k <= b}
            assert got == want, (a, b, got ^ want)
            check_head()
            snaps[versions(lake)[-1]] = dict(model)
            continue
        if op == "mor_delete":
            shape = rng.choice(["krange", "vthresh", "vmod"])
            if shape == "krange":
                a = rng.randrange(0, max(next_k, 1))
                b = a + rng.randrange(1, 15)
                pred = f"k >= {a} AND k < {b}"
                hit = lambda k, v: a <= k < b  # noqa: E731
            elif shape == "vthresh":
                t = rng.randrange(0, 1000)
                pred = f"v < {t}"
                hit = lambda k, v: v < t  # noqa: E731
            else:
                mm, r = rng.choice([3, 5, 7]), rng.randrange(0, 3)
                pred = f"v % {mm} = {r}"
                hit = lambda k, v: v % mm == r  # noqa: E731
            for k in [k for k, v in model.items() if hit(k, v)]:
                del model[k]
            delete_where(spark, lake, pred, mode="mor")
        elif op == "append":
            rows = fresh_rows(rng.randrange(1, 20))
            model.update(dict(rows))
            commit_append(
                df_of(rows).coalesce(rng.choice([1, 2])), lake,
                stats_cols=["k"], bloom_cols=["k"], bloom_bits=1 << 12,
            )
        elif op == "merge":
            keys = list(model)
            ups = [(k, rng.randrange(1000), 0)
                   for k in rng.sample(keys, min(len(keys),
                                                 rng.randrange(1, 8)))]
            remaining = [k for k in keys if k not in {u[0] for u in ups}]
            dels = [(k, 0, 1)
                    for k in rng.sample(remaining,
                                        min(len(remaining),
                                            rng.randrange(0, 4)))]
            ins = [(k, v, 0) for (k, v) in fresh_rows(rng.randrange(0, 5))]
            cdc = ups + dels + ins
            if not cdc:
                continue
            for k, v, d in cdc:
                if d:
                    model.pop(k, None)
                else:
                    model[k] = v
            merge_into(spark, lake, df_of(cdc, with_flag=True), ["k"],
                       delete_col="is_delete")
        elif op == "delete":
            shape = rng.choice(["krange", "vthresh", "vmod"])
            if shape == "krange":
                a = rng.randrange(0, max(next_k, 1))
                b = a + rng.randrange(1, 15)
                pred = f"k >= {a} AND k < {b}"
                hit = lambda k, v: a <= k < b  # noqa: E731
            elif shape == "vthresh":
                t = rng.randrange(0, 1000)
                pred = f"v < {t}"
                hit = lambda k, v: v < t  # noqa: E731
            else:
                m, r = rng.choice([3, 5, 7]), rng.randrange(0, 3)
                pred = f"v % {m} = {r}"
                hit = lambda k, v: v % m == r  # noqa: E731
            for k in [k for k, v in model.items() if hit(k, v)]:
                del model[k]
            delete_where(spark, lake, pred)
        elif op in ("update", "mor_update"):
            a = rng.choice([2, 3, 1])
            b = rng.randrange(-5, 50)
            if rng.random() < 0.5:
                t = rng.randrange(0, 1000)
                pred, hit = f"v >= {t}", (lambda k, v: v >= t)
            else:
                lo = rng.randrange(0, max(next_k, 1))
                hi = lo + rng.randrange(1, 20)
                pred = f"k >= {lo} AND k <= {hi}"
                hit = lambda k, v: lo <= k <= hi  # noqa: E731
            for k in [k for k, v in model.items() if hit(k, v)]:
                model[k] = a * model[k] + b
            update_where(spark, lake, pred, {"v": f"v * {a} + {b}"},
                         mode="mor" if op == "mor_update" else "cow")
        elif op == "compact":
            if rng.random() < 0.5:
                compact(spark, lake, target_files=rng.choice([1, 2]))
            else:
                compact(spark, lake, target_files=rng.choice([1, 2, 4]),
                        cluster_by=["k", "v"], zorder_bits=10)
        elif op == "vacuum":
            vacuum(lake, keep_last=rng.choice([1, 2, 3]))
        elif op == "clone":
            clones += 1
            dst = f"{root}/clone{clones}"
            shallow_clone(lake, dst)
            # the source state is pinned; the walk continues on the
            # clone, so later mutations must never leak back
            pins.append((lake, versions(lake)[-1], dict(model)))
            lake = dst
            snaps = {}  # restore targets are per-lake; the clone starts fresh
        elif op == "pin":
            pins.append((lake, versions(lake)[-1], dict(model)))
        elif op == "restore":
            live = [v for v in versions(lake) if v in snaps]
            if live:
                v = rng.choice(live)
                try:
                    restore(lake, v)
                    model.clear()
                    model.update(snaps[v])
                except FileNotFoundError:
                    pass  # target's files vacuumed: refused, state unchanged
        check_head()
        snaps[versions(lake)[-1]] = dict(model)
        # bloom point lookup on a random live key and a random absent key
        if model and rng.random() < 0.5:
            k = rng.choice(list(model))
            got = [(r["k"], r["v"])
                   for r in lookup_version(spark, lake, "k", k).collect()]
            assert got == [(k, model[k])], (k, got, model[k])
            absent = next_k + 10_000
            assert lookup_version(spark, lake, "k", absent).count() == 0

    # time travel: every pin must still read its exact snapshot —
    # UNLESS its manifest was vacuumed away (legal history loss) or it
    # was a clone source whose files a later source-side vacuum dropped
    for path, v, snap in pins:
        if v not in versions(path):
            continue  # vacuumed: pinned read is legitimately gone
        got = {(r["k"], r["v"])
               for r in read_version(spark, path, v).collect()}
        assert got == set(snap.items()), f"pin {path}@{v} drifted"
    shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260815

    from async_stream_processing_spark import get_spark

    spark = get_spark("lakefuzz", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0
    for i in range(n):
        rng = random.Random(seed + i)
        try:
            run_case(spark, rng)
        except AssertionError as e:
            failures += 1
            print(f"CASE {i} FAILED: {e}")
    print(f"PASS: {n - failures}/{n} (lake lifecycle, seed {seed})")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
