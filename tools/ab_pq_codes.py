"""Warm A/B of pq_codes encode shapes (r12: revert-or-fix the r11
precomputed-slice regression).  Variants:

  a) r11 current: slices pre-projected below the broadcast crossJoin
  b) r10 lazy: both slices computed inside the per-centroid lambda
  c) bound: row slice bound once per row via a 1-element-array
     transform (bind1 shape), no extra projection below the join

Each prints [cold, warm, warm, warm] noop-sink seconds and the rows'
checksum so value-equality is sanity-checked in-process.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from async_stream_processing_spark import get_spark
from async_stream_processing_spark.llm.similarity import (
    _as_double,
    _code_scorer,
    _collect_centroids,
    _d2q,
    _sub_slice,
    _subspace_slicer,
)
from async_stream_processing_spark.sources.parquet import load_table

M, KSUB, D = 8, 16, 64
DSUB = D // M


def _cmat(embeddings):
    cents = embeddings.filter(F.col("vec_id") < KSUB).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("c_emb"),
    )
    rows = sorted(_collect_centroids(cents))
    return embeddings.sparkSession.createDataFrame(
        [(
            [int(cid) for cid, _ in rows],
            [[float(x) for x in c] for _, c in rows],
        )],
        "c_ids array<bigint>, c_vecs array<array<double>>",
    )


def variant_a(embeddings):
    cmat = _cmat(embeddings).select(
        "c_ids",
        *[F.transform(F.col("c_vecs"), _subspace_slicer(j, DSUB)).alias(
            f"__c_sub_{j}") for j in range(M)],
    )
    emb = _as_double(F.col("embedding"))
    out_cols = [F.col("vec_id")]
    for j in range(M):
        scored = F.transform(
            F.col(f"__c_sub_{j}"), _code_scorer(f"__sub_{j}", "c_ids", "cid")
        )
        out_cols.append(F.array_min(scored)["cid"].alias(f"code_{j}"))
    pre = embeddings.select(
        "vec_id",
        *[_sub_slice(emb, j, DSUB).alias(f"__sub_{j}") for j in range(M)],
    )
    return pre.crossJoin(F.broadcast(cmat)).select(*out_cols)


def variant_b(embeddings):
    cmat = _cmat(embeddings)
    emb = _as_double(F.col("embedding"))
    out_cols = [F.col("vec_id")]
    for j in range(M):
        sub_v = _sub_slice(emb, j, DSUB)

        def scorer(c, i, _j=j, _sub_v=sub_v):
            return F.struct(
                _d2q(_sub_v, _sub_slice(c, _j, DSUB)).alias("d2q"),
                F.element_at(F.col("c_ids"), i + F.lit(1)).alias("cid"),
            )

        scored = F.transform(F.col("c_vecs"), lambda c, i: scorer(c, i))
        out_cols.append(F.array_min(scored)["cid"].alias(f"code_{j}"))
    return embeddings.crossJoin(F.broadcast(cmat)).select(*out_cols)


def variant_c(embeddings):
    cmat = _cmat(embeddings).select(
        "c_ids",
        *[F.transform(F.col("c_vecs"), _subspace_slicer(j, DSUB)).alias(
            f"__c_sub_{j}") for j in range(M)],
    )
    emb = _as_double(F.col("embedding"))
    out_cols = [F.col("vec_id")]
    for j in range(M):
        csub = F.col(f"__c_sub_{j}")
        bound = F.transform(
            F.array(_sub_slice(emb, j, DSUB)),
            lambda sub: F.array_min(
                F.transform(
                    csub,
                    lambda cs, i: F.struct(
                        _d2q(sub, cs).alias("d2q"),
                        F.element_at(F.col("c_ids"), i + F.lit(1))
                        .alias("cid"),
                    ),
                )
            )["cid"],
        )
        out_cols.append(F.element_at(bound, 1).alias(f"code_{j}"))
    return embeddings.crossJoin(F.broadcast(cmat)).select(*out_cols)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_pq")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    emb = load_table(spark, sf_dir, "embeddings")

    sums = {}
    for name, fn in (("a_current", variant_a), ("b_lazy", variant_b),
                     ("c_bound", variant_c)):
        times = []
        for _ in range(4):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(emb).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 2))
        chk = fn(emb).selectExpr(
            "sum(hash(vec_id, code_0, code_1, code_2, code_3, code_4, "
            "code_5, code_6, code_7)) as s"
        ).collect()[0]["s"]
        sums[name] = chk
        print(f"{name}: {times} checksum={chk}", flush=True)
    assert len(set(sums.values())) == 1, sums
    print("checksums equal")


if __name__ == "__main__":
    main()
