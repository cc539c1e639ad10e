"""Corpus shaping: term statistics, repetition filters, deterministic
stratified sampling -- the "mix and filter" half of a training-data
pipeline.

All log-free by design: natural-log TF-IDF scores are NOT bit-portable
across engines (libm vs JVM ``Math.log`` differ in final ulps), so scores
that need cross-engine verification stay rational (counts and ratios);
rank-by-count gives the same ordering TF-IDF would within a source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import stable_hash60
from ..functions.text import shingles, tokens


def top_terms_per_source(docs: DataFrame, k: int = 10) -> DataFrame:
    """Top-k terms by in-source frequency, with document frequency.

    One explode + two aggregations; the per-source rank is a window over
    the (small) term-count relation.  The classic TF-IDF shape without the
    log (rank order inside a source is identical).
    """
    terms = docs.select(
        "source", "doc_id", F.explode(tokens("text")).alias("term")
    )
    tf = terms.groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("doc_id").alias("df_in_source"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("tf"), F.asc("term"))
    return (
        tf.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("source", "term", "tf", "df_in_source",
                F.col("rank").cast("long").alias("rank"))
    )


def repetition_stats(docs: DataFrame, n: int = 3) -> DataFrame:
    """Gopher-style repetition signals: the fraction of n-gram occurrences
    belonging to the most frequent n-gram, and the duplicate-shingle ratio.
    Heavily repeated boilerplate -> high values -> filter candidates.

    All three counts are PER-DOCUMENT statistics, so they compute as a
    per-row sorted-run fold over each doc's own shingle array -- ZERO
    shuffles, one narrow pass -- instead of the explode + (doc, gram)
    shuffle + per-doc re-aggregate (two corpus-sized exchanges at
    100 TB).  ``array_sort`` puts equal grams adjacent; the fold counts
    run lengths, tracks the max run and the number of runs, giving
    bit-identical integers to the grouped form.  Docs with zero shingles
    (< n tokens) are filtered, exactly as the explode form dropped them.
    """
    arr = F.array_sort(shingles("text", n))
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("top"),
        F.lit(0).cast("long").alias("ndv"),
    )

    def merge(acc, x):
        run2 = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"),
            run2.alias("run"),
            F.greatest(acc["top"], run2).alias("top"),
            F.when(x == acc["prev"], acc["ndv"])
            .otherwise(acc["ndv"] + 1)
            .alias("ndv"),
        )

    # materialize the sorted shingle array and the fold struct ONCE
    # (r11): the former inline form re-built the array for the filter
    # and the size column and re-ran the whole fold per extracted field
    staged = docs.withColumn("__sh", arr)
    a = F.col("__sh")
    staged = staged.withColumn("__fold", F.aggregate(a, init, merge))
    agg = staged.select(
        "doc_id",
        F.size(a).cast("long").alias("n_shingles"),
        F.col("__fold")["top"].alias("top_shingle_count"),
        F.col("__fold")["ndv"].alias("n_distinct_shingles"),
    ).filter(F.col("n_shingles") > 0)
    return agg.select(
        "doc_id", "n_shingles", "top_shingle_count", "n_distinct_shingles",
        (F.col("top_shingle_count").cast("double")
         / F.col("n_shingles").cast("double")).alias("top_shingle_ratio"),
        (F.lit(1.0) - F.col("n_distinct_shingles").cast("double")
         / F.col("n_shingles").cast("double")).alias("dup_shingle_ratio"),
    )


def weighted_sample(docs: DataFrame, k: int = 50) -> DataFrame:
    """Deterministic weighted sampling without replacement: sequential
    Poisson sampling (Ohlsson '98) -- priority ``u / w`` with a
    hash-derived uniform ``u`` and weight ``w``, keep the k smallest
    priorities.  Inclusion probability is ~proportional to weight
    (here: token count, the "sample long documents more" mixture knob).

    The priority is ONE IEEE double division of a 60-bit integer hash by
    an integer weight -- exactly rounded on every engine, unlike the
    textbook ``u^(1/w)`` whose ``pow`` differs across libms in final
    ulps (same reason the module is log-free).  Hash-derived ``u`` makes
    the sample reproducible across runs, engines, and cluster sizes.
    ``orderBy().limit(k)`` plans as TakeOrderedAndProject: every
    partition keeps its own top k, the driver merges k-sized heaps -- no
    global sort, no single-partition shuffle.  Only the k survivors see
    the rank window."""
    w_tok = F.size(tokens("text"))
    pri = stable_hash60(F.col("text")).cast("double") / w_tok.cast("double")
    topk = docs.select(
        "doc_id", "source", w_tok.alias("weight"), pri.alias("priority")
    ).orderBy("priority", "doc_id").limit(k)
    win = Window.orderBy("priority", "doc_id")
    return topk.withColumn("rank", F.row_number().over(win).cast("long"))


def stratified_sample(docs: DataFrame, mod: int = 1000) -> DataFrame:
    """Deterministic per-source mixture sampling: doc kept iff
    ``stable_hash60(text) % mod < rate(source)``.

    The rate is derived from the source id (here: 100 + (src_num % 5)*150
    permille -- a stand-in for a configured mixture table).  Hash-gated
    sampling is reproducible across runs/engines/cluster sizes -- the
    property training-data pipelines need that ``rand()`` sampling lacks.
    """
    src_num = F.regexp_extract("source", "([0-9]+)", 1).cast("int")
    rate = (F.lit(100) + (src_num % 5) * F.lit(150)).alias("rate_permille")
    gate = stable_hash60(F.col("text")) % mod
    return (
        docs.select("doc_id", "source", rate, gate.alias("gate"))
        .filter(F.col("gate") < F.col("rate_permille"))
        .select("doc_id", "source", "rate_permille")
    )


def quality_stratified_sample(
    docs: DataFrame, n_strata: int = 10, keep_per: int = 5
) -> DataFrame:
    """Quality-stratified sampling: decile documents by the unigram
    rarity signal (text_analysis.token_rarity) and keep a deterministic
    hash-gated sample per stratum -- the "sample across the quality
    spectrum" mixture knob (uniform sampling over-represents the
    boilerplate head; this keeps tails inspectable).

    Strata come from NTILE over the fully-determined order
    (mean_tok_freq, doc_id); the within-stratum keep is the k smallest
    by (hash, doc_id) -- reproducible across runs, engines and cluster
    sizes, like stratified_sample.

    EXACT form -- the unpartitioned NTILE is a single-partition global
    sort over the doc-count-sized rarity relation, so this is the
    fixture/oracle-scale twin (the equidepth_histogram convention).
    At corpus scale use :func:`approx_quality_stratified_sample`:
    sketch boundaries, identical within-stratum keep, no global sort
    anywhere (r10 verdict item 3).
    """
    from .text_analysis import token_rarity

    rare = token_rarity(docs).join(docs.select("doc_id", "text"), "doc_id")
    w_decile = Window.orderBy(F.asc("mean_tok_freq"), F.asc("doc_id"))
    w_keep = Window.partitionBy("stratum").orderBy(
        F.asc("h"), F.asc("doc_id")
    )
    return (
        rare.withColumn("stratum", F.ntile(n_strata).over(w_decile))
        .withColumn("h", stable_hash60(F.col("text")))
        .withColumn("rk", F.row_number().over(w_keep))
        .filter(F.col("rk") <= keep_per)
        .select(
            "doc_id",
            F.col("stratum").cast("long").alias("stratum"),
            "mean_tok_freq",
        )
    )


def _approx_strata(
    docs: DataFrame, n_strata: int = 10, accuracy: int = 10_000
) -> DataFrame:
    """Rarity-stratum assignment for the SCALE path (r10 verdict item
    3): boundaries from ``percentile_approx`` over the rarity signal —
    a mergeable rank sketch (map-side partials, ONE ordinary
    aggregation, O(accuracy) state per partition), broadcast to the
    assignment scan as a 1-row cross join.  No unkeyed NTILE window,
    no single-partition sort anywhere.  Stratum ``i`` covers
    ``(b_{i-1}, b_i]``; boundary ties land in the lower stratum where
    NTILE would split them by row position, so stratum SIZES may
    differ from the exact form within the sketch's rank error
    (<= 1/accuracy relative rank)."""
    from .text_analysis import token_rarity

    # ONE rarity aggregation per call (round-11 review fix): the
    # boundary sketch AND the assignment scan both consume `rare`, and
    # Spark re-plans a shared subtree per branch — so pin it.  The
    # pinned relation is NARROW on purpose: the keep-hash is computed
    # BEFORE the checkpoint so `text` never materializes into it
    # (doc_id, mean_tok_freq, h — O(docs) rows of three scalars, the
    # operator's honest working set; `text` would re-land the corpus).
    rare = token_rarity(docs).join(
        docs.select("doc_id", stable_hash60(F.col("text")).alias("h")),
        "doc_id",
    ).localCheckpoint(eager=True)
    probs = [i / n_strata for i in range(1, n_strata)]
    bnds = rare.agg(
        F.percentile_approx("mean_tok_freq", probs, accuracy)
        .alias("__bnds")
    )
    v = F.col("mean_tok_freq")
    stratum = (
        F.size(F.filter(F.col("__bnds"), lambda x: x < v)) + F.lit(1)
    ).cast("long")
    return (
        rare.join(F.broadcast(bnds))
        .withColumn("stratum", stratum)
        .drop("__bnds")
    )


def approx_quality_stratified_sample(
    docs: DataFrame, n_strata: int = 10, keep_per: int = 5,
    accuracy: int = 10_000,
) -> DataFrame:
    """Scale-path twin of :func:`quality_stratified_sample`: sketch
    boundaries (:func:`_approx_strata`) instead of the exact form's
    global-sort NTILE; the within-stratum deterministic hash-gated
    keep is UNCHANGED (a keyed window over ``stratum`` — shuffles on
    the stratum key, never a single partition).  The exact NTILE form
    stays as the oracle twin; this is the plan to run at 100 TB."""
    w_keep = Window.partitionBy("stratum").orderBy(
        F.asc("h"), F.asc("doc_id")
    )
    return (
        _approx_strata(docs, n_strata, accuracy)
        .withColumn("rk", F.row_number().over(w_keep))
        .filter(F.col("rk") <= keep_per)
        .select("doc_id", "stratum", "mean_tok_freq")
    )


def train_val_split(
    docs: DataFrame,
    val_pct: int = 1,
    test_pct: int = 1,
    key: str = "source",
) -> DataFrame:
    """Deterministic EXACT-stratified train/val/test split: within every
    source, documents ordered by (hash(doc_id), doc_id) take the first
    ``floor(n * val_pct / 100)`` rows as val, the next test slice, the
    rest train -- the holdout-assignment step every training pipeline
    runs last, with per-source counts exact (not just expected), so a
    skewed source mix cannot starve a small source's eval slice.

    The order hash is over ``doc_id`` (not text): duplicate texts must
    split INDEPENDENTLY or near-dup leakage estimates between splits
    are biased (the mixture_sample lesson).  Slice boundaries are
    cross-multiplied integers (``rn * 100 <= n * pct``: no division, no
    floats).  Plan: ONE exchange on source carries both the rank and
    count windows; at 100 TB hash-gate per-row instead (expected
    fractions, zero shuffle) -- this operator is the exact form whose
    per-source counts are contractual.
    """
    h = stable_hash60(
        F.concat(F.col("doc_id").cast("string"), F.lit("|split"))
    )
    w_rank = Window.partitionBy(key).orderBy(h.asc(), F.col("doc_id").asc())
    w_all = Window.partitionBy(key)
    ranked = docs.select(
        "doc_id",
        F.col(key),
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    split = (
        F.when(F.col("rn") * 100 <= F.col("n") * val_pct, F.lit("val"))
        .when(
            F.col("rn") * 100 <= F.col("n") * (val_pct + test_pct),
            F.lit("test"),
        )
        .otherwise(F.lit("train"))
    )
    return ranked.select("doc_id", key, split.alias("split"))


def sql_train_val_split(
    val_pct: int = 1, test_pct: int = 1, src: str = "documents"
) -> str:
    from ..functions.hashing import sql_stable_hash60

    h = sql_stable_hash60("CAST(doc_id AS VARCHAR) || '|split'")
    return f"""
        WITH ranked AS (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY {h} ASC, doc_id ASC) AS rn,
                   COUNT(*) OVER (PARTITION BY source) AS n
            FROM {src})
        SELECT doc_id, source,
               CASE WHEN rn * 100 <= n * {val_pct} THEN 'val'
                    WHEN rn * 100 <= n * {val_pct + test_pct} THEN 'test'
                    ELSE 'train' END AS split
        FROM ranked
    """


def epoch_shuffle(
    docs: DataFrame, n_epochs: int = 2, n_shards: int = 4
) -> DataFrame:
    """Deterministic per-epoch global shuffle into shards — the
    reproducible data-ordering step a training run needs: epoch e's
    order is the sort by ``hash(doc_id, e)``, so every worker can
    recompute any shard's exact sequence from (seed-free) document
    identity alone, each epoch's permutation is independent, and a
    resumed run re-derives position without any stored state.

    Shard = ``h % n_shards`` (hash-balanced); position = rank within
    (epoch, shard) ordered by (h, doc_id).  Plan: the rank window is
    PARTITIONED by (epoch, shard) — at 100 TB each shard sorts
    independently at shuffle parallelism, there is no global sort; a
    production writer would follow with
    ``repartition(epoch, shard).sortWithinPartitions(pos)`` to lay the
    files out in read order.  Epochs expand map-side from a literal
    array (no driver loop, no union of N plans)."""
    e = F.explode(
        F.array(*[F.lit(i) for i in range(n_epochs)])
    ).alias("epoch")
    g = docs.select("doc_id", e).select(
        "doc_id",
        "epoch",
        stable_hash60(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("epoch").cast("string"),
            )
        ).alias("h"),
    )
    shard = (F.col("h") % n_shards).alias("shard")
    w = Window.partitionBy("epoch", F.col("h") % n_shards).orderBy(
        F.col("h").asc(), F.col("doc_id").asc()
    )
    return g.select(
        "epoch",
        shard,
        F.row_number().over(w).cast("long").alias("pos"),
        "doc_id",
    )


def sql_epoch_shuffle(
    n_epochs: int = 2, n_shards: int = 4, src: str = "documents"
) -> str:
    from ..functions.hashing import sql_stable_hash60

    h = sql_stable_hash60(
        "CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)"
    )
    epochs = " UNION ALL ".join(
        f"SELECT {i} AS epoch" for i in range(n_epochs)
    )
    return f"""
        WITH g AS (
            SELECT doc_id, epoch, {h} AS h
            FROM {src} CROSS JOIN ({epochs}) e)
        SELECT epoch, h % {n_shards} AS shard,
               ROW_NUMBER() OVER (PARTITION BY epoch, h % {n_shards}
                                  ORDER BY h ASC, doc_id ASC) AS pos,
               doc_id
        FROM g
    """


def group_reservoir(
    df: DataFrame,
    keys: list[str],
    id_expr,
    k: int = 5,
    salt: str = "rsv",
    rank_col: str = "rank",
    hash_mode: str = "md5",
) -> DataFrame:
    """Deterministic fixed-k "reservoir" sample per key: every row gets
    a stable 60-bit hash of ``salt || id`` and each key keeps its k
    hash-smallest rows -- the uniform-without-replacement per-group
    sample a pipeline uses for per-source eval slices or debugging
    exemplars, reproducible across runs, engines and retries (unlike a
    true streaming reservoir, whose result depends on arrival order).

    Scale path: the rank runs through ``plans.scale.topk_by_group``
    (partition-partial top-k, then a final rank over P*k survivors per
    key), so no single window ever funnels the corpus into |keys|
    tasks; the hash order is total (tiebreak on ``id_expr``), which is
    the exactness precondition topk_by_group documents.
    ``hash_mode="xxhash64"`` swaps the oracle-portable md5 hash for the
    ~3x-cheaper production hash (same knob as the dedup family; no
    cross-engine parity on that path).
    """
    from ..functions.hashing import stable_hash60 as _md5h
    from ..plans.scale import topk_by_group

    tagged_id = F.concat(F.lit(salt + "|"), id_expr.cast("string"))
    h = (F.abs(F.xxhash64(tagged_id)) if hash_mode == "xxhash64"
         else _md5h(tagged_id))
    tagged = df.withColumn("__h", h)
    out = topk_by_group(
        tagged, keys, [F.col("__h").asc(), id_expr.asc()], k,
        rank_col=rank_col,
    )
    return out.drop("__h")
