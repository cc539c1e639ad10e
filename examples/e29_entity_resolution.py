"""Round-11 continuation tour: entity resolution + incremental MV.

Two workflows a data platform runs daily, composed from this round's
operators (the reference engine has no string matching and no storage,
so both are beyond its surface — SURVEY §2 checklist 'absent' rows):

1. **Entity resolution**: a product registry with near-duplicate
   spellings goes pairs -> clusters -> golden records via blocked
   edit-distance linkage (``operators/linkage.py``) and
   pointer-jumping connected components; the canonical record absorbs
   every variant's support.
2. **Incremental reporting**: a per-(user, event_type) count/sum view
   follows a versioned lake through appends and deletes by folding the
   row-level change feed only (``plans/mv.py``) — never re-scanning
   the table — and lands refreshed totals that match a recompute
   bit-for-bit.
"""

from __future__ import annotations

import sys
import tempfile


def main(spark):
    from pyspark.sql import functions as F

    sys.path.insert(0, ".")
    from async_stream_processing_spark.llm.dedup import connected_components
    from async_stream_processing_spark.operators.linkage import (
        fuzzy_self_pairs,
        token_blocks,
    )
    from async_stream_processing_spark.plans.mv import (
        maintain_view,
        sum_count_view,
    )
    from async_stream_processing_spark.plans.versioned import (
        commit_append,
        delete_where,
        read_version,
    )
    from async_stream_processing_spark.sources.parquet import load_table

    sf = "/root/testdata/sf0.001"

    # --- 1. entity resolution over the part registry -----------------
    ents = (
        load_table(spark, sf, "part")
        .groupBy("p_name", "p_brand")
        .agg(F.count(F.lit(1)).alias("support"),
             F.min("p_partkey").alias("ent_id"))
        .select(F.concat_ws(" ", "p_name", "p_brand").alias("name"),
                "support", "ent_id")
        .localCheckpoint(eager=True)
    )
    pairs = fuzzy_self_pairs(
        ents, key="name", text="name",
        blocks=token_blocks(first_n=2, last_n=1), max_dist=2,
    ).select(F.col("ent_id_a").alias("doc_a"),
             F.col("ent_id_b").alias("doc_b"))
    labels, rounds = connected_components(pairs.localCheckpoint(eager=True))
    n_ents = ents.count()
    n_clusters = labels.select("cluster_id").distinct().count()
    merged = labels.count()
    print(f"ER: {n_ents} entities, {merged} in {n_clusters} multi-member "
          f"clusters after {rounds} CC rounds")
    assert merged > n_clusters > 0

    # --- 2. incremental MV over a versioned lake ---------------------
    ev = load_table(spark, sf, "events").select(
        "user_id", "event_type",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long").alias("x_c"),
    )
    keys = ["user_id", "event_type"]
    with tempfile.TemporaryDirectory() as tmp:
        lake = f"{tmp}/lake"
        commit_append(ev.filter(F.col("user_id") % 2 == 0), lake)
        view = sum_count_view(
            read_version(spark, lake, 1), keys, "x_c"
        ).localCheckpoint(eager=True)
        commit_append(ev.filter(F.col("user_id") % 2 == 1), lake)
        delete_where(spark, lake, "x_c < 500")
        refreshed = maintain_view(spark, lake, view, keys, "x_c", 1, 3)
        direct = sum_count_view(read_version(spark, lake), keys, "x_c")
        assert refreshed.exceptAll(direct).count() == 0
        assert direct.exceptAll(refreshed).count() == 0
        n = refreshed.count()
        print(f"MV: refreshed to v3 from the change feed alone, "
              f"{n} groups, equals recompute exactly")
    return labels


if __name__ == "__main__":
    from common import get_example_spark

    main(get_example_spark())
