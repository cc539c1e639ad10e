"""Corpus curation filters for LLM training-data pipelines.

Implements the published document-level filtering rules a 100 TB curation
pipeline applies before training:

* **Gopher repetition rules** (Rae et al. 2021, "Scaling Language Models:
  Methods, Analysis & Insights from Training Gopher", Appendix A1.1):
  fraction of characters covered by the most frequent word {2,3,4}-gram
  and by duplicated 5-grams, each thresholded (0.20 / 0.18 / 0.16 / 0.15).
* **Gopher quality rules** (same appendix): word-count bounds, mean word
  length bounds, minimum stop-word hits, minimum alphabetic-word ratio.
* **Sequence packing**: assign documents to fixed-token-budget training
  chunks by cumulative token offset — the "pack documents into 2048-token
  training sequences" step, as a deterministic window computation.
* **Source mixture balancing**: deterministic hash-gated downsampling
  that equalizes per-source document counts (the mixture-reweighting knob
  of C4/Pile-style corpus assembly), with the acceptance test done in
  cross-multiplied INTEGER arithmetic so no division can diverge.

Determinism contract (see ``functions/numeric.py``): every *decision*
(keep flag, chunk id, sample gate) is computed in pure integer arithmetic
— cross-multiplied thresholds instead of ratio comparisons — so results
are bit-identical across engines and partitionings.  The ``*_frac``
ratio columns are single IEEE double divisions of exact integers,
emitted for reporting only.

Scale shape: ``gopher_repetition`` is ONE explode + ONE shuffle for all
four n-gram sizes (the n-tagged union is consumed by a single
``groupBy(doc_id, n, gram)``); ``gopher_quality`` is pure per-row column
expressions (zero shuffles); ``pack_sequences`` is one hash shuffle on
the pack key; ``mixture_sample`` broadcasts a per-source count table
(#sources rows) — the corpus itself is never shuffled.

Reference parity note: the reference engine (asyncio event loop,
/root/reference/src/async_stream_processing/processor.py) has no corpus
operators; this module is part of the LLM-pipeline extension surface
required by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import sql_stable_hash60, stable_hash60
from ..functions.text import (
    LANG_STOPWORDS,
    bind1,
    shingles,
    sql_shingles,
    sql_tokens,
    tokens,
)

#: Gopher Appendix A1.1 thresholds as exact rationals (num, den):
#: top-2-gram char fraction > 1/5, top-3 > 9/50, top-4 > 4/25,
#: duplicated-5-gram char fraction > 3/20.
GOPHER_TOP_NGRAM = {2: (1, 5), 3: (9, 50), 4: (4, 25)}
GOPHER_DUP_NGRAM = {5: (3, 20)}


def _word_chars(words) -> F.Column:
    """Total characters across tokens (separators excluded) — exact int."""
    return F.aggregate(
        F.transform(words, lambda x: F.length(x)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _top_ngram_chars(n: int, text_col: str = "__t", min_count: int = 1):
    """``count * gram-word-chars`` of THE most frequent word n-gram of
    one document (ties toward longer, then lexicographically greater
    gram), computed PER ROW: sort the doc's own shingle array and fold
    over the runs -- O(L log L) per doc, ZERO shuffles, vs the explode +
    (doc, n, gram) shuffle + rank window formulation (A/B at sf0.1:
    2.3 s vs 3.8 s warm, and the removed shuffle is corpus-sized at
    100 TB).  The statistic is per-document by definition, so nothing
    cross-row is lost."""
    arr = F.array_sort(shingles(text_col, n))
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("bc"),
        F.lit(0).cast("long").alias("bgc"),
        F.lit(None).cast("string").alias("bs"),
    )

    def merge(acc, x):
        run2 = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        gc2 = (F.length(x) - F.lit(n - 1)).cast("long")
        better = (run2 > acc["bc"]) | (
            (run2 == acc["bc"])
            & ((gc2 > acc["bgc"]) | ((gc2 == acc["bgc"]) & (x > acc["bs"])))
        )
        return F.struct(
            x.alias("prev"),
            run2.alias("run"),
            F.when(better, run2).otherwise(acc["bc"]).alias("bc"),
            F.when(better, gc2).otherwise(acc["bgc"]).alias("bgc"),
            F.when(better, x).otherwise(acc["bs"]).alias("bs"),
        )

    # bind the fold result ONCE (r11): each struct-field reference
    # re-evaluates the whole sort+fold subtree (no CSE across HOFs) --
    # the bc*bgc product alone paid the fold twice, three times with
    # the min_count guard
    def score(fd):
        out = (fd["bc"] * fd["bgc"]).cast("long")
        if min_count > 1:
            # the full rule set only scores a top gram that repeats
            out = F.when(fd["bc"] >= min_count, out).otherwise(
                F.lit(0).cast("long")
            )
        return out

    return bind1(F.aggregate(arr, init, merge), score)


def _dup_element_stats(arr):
    """Duplicate-element stats of ONE document's element array, PER ROW:
    struct(n, dup, dup_chars) where ``n`` = total elements, ``dup`` =
    occurrences beyond the first of any repeated element, ``dup_chars``
    = their summed lengths.  Same sorted-run fold as
    :func:`_top_ngram_chars` -- O(E log E) per doc, ZERO shuffles --
    replacing an explode + (doc, element) shuffle + per-doc re-aggregate
    + join per granularity.  Equality-run counting only needs equal
    values adjacent, which ``array_sort`` guarantees, so the integer
    outputs are identical to the grouped form.

    Both the input array and the fold result are bound ONCE (r11):
    the former inline form re-split the document for the size() and
    re-ran the whole sort+fold per struct field.  Callers consuming
    several fields should still materialize the returned struct in a
    withColumn so the whole helper runs once per row."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("dup"),
        F.lit(0).cast("long").alias("dup_chars"),
    )

    def merge(acc, x):
        is_dup = x == acc["prev"]
        return F.struct(
            x.alias("prev"),
            F.when(is_dup, acc["dup"] + 1).otherwise(acc["dup"]).alias("dup"),
            F.when(is_dup, acc["dup_chars"] + F.length(x))
            .otherwise(acc["dup_chars"])
            .alias("dup_chars"),
        )

    def over(a):
        folded = F.aggregate(F.array_sort(a), init, merge)
        return bind1(
            folded,
            lambda fd: F.struct(
                F.size(a).cast("long").alias("n"),
                fd["dup"].alias("dup"),
                fd["dup_chars"].alias("dup_chars"),
            ),
        )

    return bind1(arr, over)


def gopher_repetition(docs: DataFrame, text: str = "text") -> DataFrame:
    """Per-document Gopher repetition signals + integer-exact keep flags.

    For n in {2,3,4}: ``top{n}_chars`` = occurrence-characters of THE
    most frequent word n-gram — argmax by count, ties broken toward the
    longer then lexicographically greater gram so the pick is
    deterministic cross-engine — times its word-chars; for n=5:
    ``dup5_chars`` = characters of the UNIQUE token positions covered by
    any 5-gram occurring more than once (overlapping occurrences are
    interval-unioned, the paper's character-coverage definition — also
    how datatrove/NeMo-Curator implement it), so ``dup5_frac`` is always
    in [0, 1].  Fractions are over total word
    characters.  ``flag_*`` columns apply the published thresholds via
    cross-multiplication (e.g. top2 > 1/5  <=>  5*top2_chars >
    total_word_chars); ``keep`` = no flag fired.

    Plan shape: the top-gram signals are PER-DOCUMENT statistics, so
    they compute as per-row sorted-run folds over each doc's own shingle
    arrays (``_top_ngram_chars``) -- zero shuffles, one narrow pass for
    all three n.  Only ``dup5`` (which needs token positions for the
    interval-union coverage rule) pays a keyed explode.
    """
    from .dedup import fan_out

    # the 4-size shingle generation is the CPU hot spot: fan a narrow
    # file scan out to all cores first (no-op when files >= slots)
    base = fan_out(docs.select("doc_id", F.col(text).alias("__t")))

    # THE most frequent gram per (doc, n) -- not the max-coverage gram:
    # the paper's rule scores the top-count gram's coverage.  Per-doc
    # statistic -> per-row sorted-run fold, no explode, no shuffle
    # (see _top_ngram_chars).  Totals ride in the SAME narrow select --
    # one scan, no doc-keyed join between totals and the top-gram wide
    # relation.
    totals_wide = base.select(
        "doc_id",
        _word_chars(tokens("__t")).alias("total_word_chars"),
        *[_top_ngram_chars(n).alias(f"top{n}_chars") for n in (2, 3, 4)],
    )
    # dup5: UNIQUE character coverage — positions of every occurrence of a
    # duplicated 5-gram, interval-unioned over token indices, then summed
    # token lengths.  Needs positions, so it runs off its own posexplode
    # (one extra (doc_id, gram)-keyed shuffle); the overlap-counting
    # count*len form can exceed total_word_chars and misstates the
    # paper's coverage rule.
    g5 = base.select(
        "doc_id", F.posexplode(shingles("__t", 5)).alias("pos", "s")
    )
    dup_occ = g5.withColumn(
        "c", F.count(F.lit(1)).over(Window.partitionBy("doc_id", "s"))
    ).filter(F.col("c") >= 2)
    cov = dup_occ.select(
        "doc_id",
        F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(4))).alias(
            "idx"
        ),
    ).distinct()
    tok_pos = base.select(
        "doc_id", F.posexplode(tokens("__t")).alias("idx", "tok")
    )
    dup5 = (
        cov.join(tok_pos, ["doc_id", "idx"])
        .groupBy("doc_id")
        .agg(F.sum(F.length("tok")).cast("long").alias("dup5_chars"))
    )
    out = (
        totals_wide.join(dup5, "doc_id", "left")
        .na.fill({f"top{n}_chars": 0 for n in (2, 3, 4)} | {"dup5_chars": 0})
    )
    tot = F.col("total_word_chars")
    flag_exprs = []
    for n, (num, den) in GOPHER_TOP_NGRAM.items():
        flag_exprs.append(
            (f"flag_top{n}", F.col(f"top{n}_chars") * den > tot * num)
        )
    dnum, dden = GOPHER_DUP_NGRAM[5]
    flag_exprs.append(("flag_dup5", F.col("dup5_chars") * dden > tot * dnum))
    flags = [expr.alias(name) for name, expr in flag_exprs]

    def frac(col):
        # guard tot = 0 (whitespace-only doc): NULL in both engines --
        # Spark's 0.0/0.0 is NaN where DuckDB's is NULL
        return F.when(tot > 0, col.cast("double") / tot.cast("double"))

    fracs = [
        frac(F.col(f"top{n}_chars")).alias(f"top{n}_frac") for n in (2, 3, 4)
    ] + [frac(F.col("dup5_chars")).alias("dup5_frac")]
    any_flag = flag_exprs[0][1]
    for _, expr in flag_exprs[1:]:
        any_flag = any_flag | expr
    keep = ~any_flag
    return out.select(
        "doc_id",
        "total_word_chars",
        "top2_chars",
        "top3_chars",
        "top4_chars",
        "dup5_chars",
        *fracs,
        *flags,
        keep.alias("keep"),
    )


def sql_gopher_repetition(src: str = "documents") -> str:
    """DuckDB twin of :func:`gopher_repetition` (same single-pass shape)."""
    gram_selects = " UNION ALL ".join(
        f"SELECT doc_id, {n} AS n, unnest({sql_shingles('w', n)}) AS s FROM words"
        for n in (2, 3, 4)
    )
    flag_terms = [
        (f"flag_top{n}",
         f"COALESCE(w.top{n}_chars, 0) * {den} > t.total_word_chars * {num}")
        for n, (num, den) in GOPHER_TOP_NGRAM.items()
    ]
    dnum, dden = GOPHER_DUP_NGRAM[5]
    flag_terms.append(
        ("flag_dup5",
         f"COALESCE(d5.dup5_chars, 0) * {dden} > t.total_word_chars * {dnum}")
    )
    flag_sql = ",\n               ".join(
        f"{expr} AS {name}" for name, expr in flag_terms
    )
    any_flag_sql = "\n                    OR ".join(e for _, e in flag_terms)
    return f"""
        WITH words AS (SELECT doc_id, {sql_tokens('text')} AS w FROM {src}),
        totals AS (SELECT doc_id,
                          CAST(list_sum(list_transform(w, x -> len(x)))
                               AS BIGINT) AS total_word_chars
                   FROM words),
        grams AS ({gram_selects}),
        per AS (SELECT doc_id, n, s, COUNT(*) AS c,
                       len(s) - (n - 1) AS gc,
                       ROW_NUMBER() OVER (PARTITION BY doc_id, n
                                          ORDER BY COUNT(*) DESC,
                                                   len(s) - (n - 1) DESC,
                                                   s DESC) AS rn
                FROM grams GROUP BY doc_id, n, s),
        agg AS (SELECT doc_id, n,
                       MAX(CASE WHEN rn = 1 THEN c * gc END) AS top_chars
                FROM per GROUP BY doc_id, n),
        wide AS (SELECT doc_id,
                        COALESCE(MAX(CASE WHEN n = 2 THEN top_chars END), 0) AS top2_chars,
                        COALESCE(MAX(CASE WHEN n = 3 THEN top_chars END), 0) AS top3_chars,
                        COALESCE(MAX(CASE WHEN n = 4 THEN top_chars END), 0) AS top4_chars
                 FROM agg GROUP BY doc_id),
        g5 AS (SELECT doc_id, unnest(sh) AS s, unnest(range(len(sh))) AS pos
               FROM (SELECT doc_id, {sql_shingles('w', 5)} AS sh
                     FROM words) q5),
        dup5g AS (SELECT doc_id, s FROM g5
                  GROUP BY doc_id, s HAVING COUNT(*) >= 2),
        cov AS (SELECT DISTINCT g.doc_id,
                       unnest(range(g.pos, g.pos + 5)) AS idx
                FROM g5 g JOIN dup5g d ON d.doc_id = g.doc_id AND d.s = g.s),
        toklen AS (SELECT doc_id, unnest(range(len(w))) AS idx,
                          unnest(list_transform(w, x -> len(x))) AS tl
                   FROM words),
        dup5c AS (SELECT c.doc_id, SUM(t2.tl) AS dup5_chars
                  FROM cov c JOIN toklen t2
                    ON t2.doc_id = c.doc_id AND t2.idx = c.idx
                  GROUP BY c.doc_id)
        SELECT t.doc_id, t.total_word_chars,
               CAST(COALESCE(w.top2_chars, 0) AS BIGINT) AS top2_chars,
               CAST(COALESCE(w.top3_chars, 0) AS BIGINT) AS top3_chars,
               CAST(COALESCE(w.top4_chars, 0) AS BIGINT) AS top4_chars,
               CAST(COALESCE(d5.dup5_chars, 0) AS BIGINT) AS dup5_chars,
               CASE WHEN t.total_word_chars > 0 THEN
                   CAST(COALESCE(w.top2_chars, 0) AS DOUBLE)
                   / CAST(t.total_word_chars AS DOUBLE) END AS top2_frac,
               CASE WHEN t.total_word_chars > 0 THEN
                   CAST(COALESCE(w.top3_chars, 0) AS DOUBLE)
                   / CAST(t.total_word_chars AS DOUBLE) END AS top3_frac,
               CASE WHEN t.total_word_chars > 0 THEN
                   CAST(COALESCE(w.top4_chars, 0) AS DOUBLE)
                   / CAST(t.total_word_chars AS DOUBLE) END AS top4_frac,
               CASE WHEN t.total_word_chars > 0 THEN
                   CAST(COALESCE(d5.dup5_chars, 0) AS DOUBLE)
                   / CAST(t.total_word_chars AS DOUBLE) END AS dup5_frac,
               {flag_sql},
               NOT ({any_flag_sql}) AS keep
        FROM totals t LEFT JOIN wide w ON w.doc_id = t.doc_id
        LEFT JOIN dup5c d5 ON d5.doc_id = t.doc_id
    """


#: Gopher quality bounds: word count in [50, 100000]; mean word length in
#: [3, 10]; >= 2 stop-word hits; >= 80% of words contain a letter.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3
GOPHER_MAX_MEAN_LEN = 10
GOPHER_MIN_STOP_HITS = 2
GOPHER_ALPHA_NUM, GOPHER_ALPHA_DEN = 4, 5  # alpha_words/n_words >= 4/5


def gopher_keep_expr(text: str = "text") -> "F.Column":
    """The Gopher keep decision as ONE narrow column expression over the
    raw text column -- the same four integer-space flags as
    :func:`gopher_quality`, usable inside any per-row select (streaming
    stateless scoring, inline label bootstrapping) without that
    function's projection.

    The token array is bound ONCE (``bind1`` -- r11: the inline form
    re-tokenized the document four times per row, once per flag;
    HOF-heavy expressions get no common-subexpression elimination)."""
    from ..functions.text import bind1

    def build(w):
        n_words = F.size(w).cast("long")
        total_chars = _word_chars(w)
        stop = F.array(*[F.lit(s) for s in LANG_STOPWORDS["en"]])
        stop_hits = F.size(
            F.filter(w, lambda x: F.array_contains(stop, x))
        ).cast("long")
        alpha_words = F.size(
            F.filter(w, lambda x: x.rlike("[a-z]"))
        ).cast("long")
        flag_n = (n_words < GOPHER_MIN_WORDS) | (n_words > GOPHER_MAX_WORDS)
        flag_len = (GOPHER_MIN_MEAN_LEN * n_words > total_chars) | (
            total_chars > GOPHER_MAX_MEAN_LEN * n_words
        )
        flag_stop = stop_hits < GOPHER_MIN_STOP_HITS
        flag_alpha = (
            GOPHER_ALPHA_DEN * alpha_words < GOPHER_ALPHA_NUM * n_words
        )
        return ~(flag_n | flag_len | flag_stop | flag_alpha)

    return bind1(tokens(text), build)


def gopher_quality(docs: DataFrame, text: str = "text") -> DataFrame:
    """Gopher document-quality rules as pure column expressions (zero
    shuffles, zero UDFs).  Every flag is decided in integer space:

    * ``flag_n_words``: word count outside [50, 100000]
    * ``flag_word_len``: mean word length outside [3, 10], tested as
      ``3*n_words <= total_chars <= 10*n_words`` (no division)
    * ``flag_stop``: fewer than 2 English stop-word hits
    * ``flag_alpha``: alphabetic-word ratio < 4/5, tested as
      ``5*alpha_words < 4*n_words``

    ``keep`` = no flag fired.  ``mean_word_len`` (double) is reporting
    only.
    """
    base = docs.select("doc_id", F.col(text).alias("__t")).withColumn(
        "__w", tokens("__t")
    )
    w = F.col("__w")
    n_words = F.size(w).cast("long")
    total_chars = _word_chars(w)
    stop = F.array(*[F.lit(s) for s in LANG_STOPWORDS["en"]])
    stop_hits = F.size(F.filter(w, lambda x: F.array_contains(stop, x))).cast(
        "long"
    )
    alpha_words = F.size(F.filter(w, lambda x: x.rlike("[a-z]"))).cast("long")
    out = base.select(
        "doc_id",
        n_words.alias("n_words"),
        total_chars.alias("total_word_chars"),
        stop_hits.alias("stop_hits"),
        alpha_words.alias("alpha_words"),
    )
    nw, tc = F.col("n_words"), F.col("total_word_chars")
    flag_n = (nw < GOPHER_MIN_WORDS) | (nw > GOPHER_MAX_WORDS)
    flag_len = (GOPHER_MIN_MEAN_LEN * nw > tc) | (tc > GOPHER_MAX_MEAN_LEN * nw)
    flag_stop = F.col("stop_hits") < GOPHER_MIN_STOP_HITS
    flag_alpha = (
        GOPHER_ALPHA_DEN * F.col("alpha_words") < GOPHER_ALPHA_NUM * nw
    )
    return out.select(
        "doc_id",
        "n_words",
        "total_word_chars",
        "stop_hits",
        "alpha_words",
        (tc.cast("double") / nw.cast("double")).alias("mean_word_len"),
        flag_n.alias("flag_n_words"),
        flag_len.alias("flag_word_len"),
        flag_stop.alias("flag_stop"),
        flag_alpha.alias("flag_alpha"),
        (~(flag_n | flag_len | flag_stop | flag_alpha)).alias("keep"),
    )


def sql_gopher_quality(src: str = "documents") -> str:
    stop_list = ", ".join(f"'{s}'" for s in LANG_STOPWORDS["en"])
    return f"""
        WITH base AS (SELECT doc_id, {sql_tokens('text')} AS w FROM {src}),
        m AS (SELECT doc_id,
                     CAST(len(w) AS BIGINT) AS n_words,
                     CAST(list_sum(list_transform(w, x -> len(x)))
                          AS BIGINT) AS total_word_chars,
                     CAST(len(list_filter(w, x -> list_contains([{stop_list}], x)))
                          AS BIGINT) AS stop_hits,
                     CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
                          AS BIGINT) AS alpha_words
              FROM base)
        SELECT doc_id, n_words, total_word_chars, stop_hits, alpha_words,
               CAST(total_word_chars AS DOUBLE) / CAST(n_words AS DOUBLE)
                   AS mean_word_len,
               (n_words < {GOPHER_MIN_WORDS} OR n_words > {GOPHER_MAX_WORDS})
                   AS flag_n_words,
               ({GOPHER_MIN_MEAN_LEN} * n_words > total_word_chars
                OR total_word_chars > {GOPHER_MAX_MEAN_LEN} * n_words)
                   AS flag_word_len,
               stop_hits < {GOPHER_MIN_STOP_HITS} AS flag_stop,
               {GOPHER_ALPHA_DEN} * alpha_words
                   < {GOPHER_ALPHA_NUM} * n_words AS flag_alpha,
               NOT ((n_words < {GOPHER_MIN_WORDS} OR n_words > {GOPHER_MAX_WORDS})
                    OR ({GOPHER_MIN_MEAN_LEN} * n_words > total_word_chars
                        OR total_word_chars > {GOPHER_MAX_MEAN_LEN} * n_words)
                    OR stop_hits < {GOPHER_MIN_STOP_HITS}
                    OR {GOPHER_ALPHA_DEN} * alpha_words
                       < {GOPHER_ALPHA_NUM} * n_words) AS keep
        FROM m
    """


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    key: str = "source",
    order: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Assign documents to fixed-token-budget training chunks.

    The packing rule is offset chunking: within each ``key`` group,
    documents are laid out in ``order`` and a document belongs to the
    chunk containing its FIRST token (``chunk_id = start_offset //
    budget``).  This is the deterministic, shuffle-minimal cousin of
    greedy first-fit packing: one window cumsum per group, no iteration,
    and the assignment is independent of partitioning (the window is
    keyed + totally ordered).

    Scale shape: one hash shuffle on ``key``; each group's cumsum is a
    single sorted pass.  At 100 TB the key is a (source, shard) pair so
    no single group exceeds an executor; chunk ids remain stable because
    offsets are group-local.

    Returns (doc_id, key, n_tokens, start_offset, chunk_id,
    chunk_offset).
    """
    n_tok = F.size(tokens(text)).cast("long")
    w = (
        Window.partitionBy(key)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = docs.select(
        "doc_id", F.col(key), n_tok.alias("n_tokens")
    ).withColumn("start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return base.select(
        "doc_id",
        key,
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset DIV {budget}").cast("long").alias("chunk_id"),
        (F.col("start_offset") % budget).cast("long").alias("chunk_offset"),
    )


def length_bucketed_packing(
    docs: DataFrame,
    n_length_buckets: int = 4,
    batch_tokens: int = 2048,
    text: str = "text",
) -> DataFrame:
    """Length-bucketed batch assignment with a padding-waste audit —
    the batching layout a padded training loop actually pays for.

    Documents are quantile-bucketed by token count (NTILE over
    (n_tokens, doc_id) — deterministic ties), laid out LONGEST-FIRST
    within each bucket, and cut into batches by cumulative token budget
    (the :func:`pack_sequences` offset-chunking rule).  Because
    batch-mates have similar lengths, padding-to-max inside a batch is
    small; the output is the per-(bucket, batch) audit row —
    ``pad_tokens = max_tokens * n_docs - sum_tokens`` is exactly the
    wasted cells a pad-to-longest collator allocates.  All integer
    arithmetic, cross-engine exact.

    Scale shape: the quantile NTILE is a global sort at fixture scale;
    at 100 TB the bucket boundaries come from ``approx_percentile``
    (mergeable sketch, no global sort — the ``approx_equidepth``
    pattern) and the within-bucket layout is one hash shuffle + sorted
    pass per bucket, exactly :func:`pack_sequences`'s shape."""
    n_tok = F.size(tokens(text)).cast("long")
    base = docs.select("doc_id", n_tok.alias("n_tokens"))
    wq = Window.orderBy(F.asc("n_tokens"), F.asc("doc_id"))
    b = base.withColumn(
        "bucket", (F.ntile(n_length_buckets).over(wq) - 1).cast("long")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.desc("n_tokens"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = b.withColumn(
        "start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    ).withColumn(
        "batch_id",
        F.expr(f"start_offset DIV {batch_tokens}").cast("long"),
    )
    agg = off.groupBy("bucket", "batch_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
    )
    return agg.withColumn(
        "pad_tokens",
        (F.col("max_tokens") * F.col("n_docs") - F.col("sum_tokens"))
        .cast("long"),
    )


def sql_length_bucketed_packing(
    src: str = "documents",
    n_length_buckets: int = 4,
    batch_tokens: int = 2048,
) -> str:
    """DuckDB twin of :func:`length_bucketed_packing` (same NTILE tie
    rule, same longest-first layout, same offset chunking)."""
    return f"""
        WITH base AS (
            SELECT doc_id,
                   CAST(len({sql_tokens('text')}) AS BIGINT) AS n_tokens
            FROM {src}),
        bkt AS (
            SELECT doc_id, n_tokens,
                   CAST(NTILE({n_length_buckets}) OVER (
                        ORDER BY n_tokens ASC, doc_id ASC) - 1
                        AS BIGINT) AS bucket
            FROM base),
        offs AS (
            SELECT bucket, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                        PARTITION BY bucket
                        ORDER BY n_tokens DESC, doc_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS start_offset
            FROM bkt)
        SELECT bucket,
               start_offset // {batch_tokens} AS batch_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
               CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
               CAST(MAX(n_tokens) * COUNT(*) - SUM(n_tokens) AS BIGINT)
                   AS pad_tokens
        FROM offs
        GROUP BY bucket, start_offset // {batch_tokens}
    """


def sql_pack_sequences(
    src: str = "documents", budget: int = 512, key: str = "source",
    order: str = "doc_id",
) -> str:
    return f"""
        WITH base AS (
            SELECT doc_id, {key},
                   CAST(len({sql_tokens('text')}) AS BIGINT) AS n_tokens
            FROM {src}),
        offs AS (
            SELECT doc_id, {key}, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                        PARTITION BY {key} ORDER BY {order}
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS start_offset
            FROM base)
        SELECT doc_id, {key}, n_tokens, start_offset,
               start_offset // {budget} AS chunk_id,
               start_offset % {budget} AS chunk_offset
        FROM offs
    """


#: Hash-gate modulus for mixture sampling (20-bit: keeps the
#: cross-multiplied acceptance test far below BIGINT overflow).
MIX_MOD = 1 << 20
#: Target per-source count as a fraction of the smallest source:
#: min_count * TARGET_NUM / TARGET_DEN (an exact rational — never a float).
MIX_TARGET_NUM, MIX_TARGET_DEN = 1, 2


def mixture_sample(docs: DataFrame, key: str = "source", text: str = "text") -> DataFrame:
    """Deterministic source-mixture balancing: downsample every source to
    the same target count — ``MIX_TARGET_NUM/MIX_TARGET_DEN`` of the
    SMALLEST source — in expectation.

    Acceptance test in pure integers: keep a doc iff
    ``hash20 * src_count * DEN < 2^20 * min_count * NUM`` — the
    cross-multiplied form of ``uniform < target / src_count``, so no
    division and no float can diverge between engines.  The per-source
    count table is #sources rows (broadcast join); the corpus is never
    shuffled.

    Returns kept rows (doc_id, key, src_count, min_count, hash20).
    """
    counts = docs.groupBy(key).agg(F.count(F.lit(1)).alias("src_count"))
    min_count = counts.agg(F.min("src_count").alias("min_count"))
    gated = (
        docs.select("doc_id", F.col(key))
        .join(F.broadcast(counts), key)
        .crossJoin(F.broadcast(min_count))
        .withColumn(
            # gate on doc_id, not text: identical texts (duplicates) must
            # draw INDEPENDENT gates or dup-heavy sources bias the mixture
            "hash20",
            stable_hash60(
                F.concat(F.col("doc_id").cast("string"), F.lit("|mix"))
            ) % MIX_MOD,
        )
    )
    return gated.filter(
        F.col("hash20") * F.col("src_count") * MIX_TARGET_DEN
        < F.lit(MIX_MOD) * F.col("min_count") * MIX_TARGET_NUM
    ).select("doc_id", key, "src_count", "min_count", "hash20")


def sql_mixture_sample(src: str = "documents", key: str = "source") -> str:
    h = sql_stable_hash60("CAST(d.doc_id AS VARCHAR) || '|mix'")
    return f"""
        WITH counts AS (SELECT {key}, COUNT(*) AS src_count
                        FROM {src} GROUP BY {key}),
        mn AS (SELECT MIN(src_count) AS min_count FROM counts)
        SELECT d.doc_id, d.{key},
               CAST(c.src_count AS BIGINT) AS src_count,
               CAST(mn.min_count AS BIGINT) AS min_count,
               CAST(({h}) % {MIX_MOD} AS BIGINT) AS hash20
        FROM {src} d
        JOIN counts c ON c.{key} = d.{key}
        CROSS JOIN mn
        WHERE ({h}) % {MIX_MOD} * c.src_count * {MIX_TARGET_DEN}
              < {MIX_MOD} * mn.min_count * {MIX_TARGET_NUM}
    """


def temperature_mixture(
    docs: DataFrame,
    key: str = "source",
    total_target: int = 1000,
    quantum: int = 1_000_000_000,
) -> DataFrame:
    """Temperature-scaled mixture weights (the multilingual-sampling rule
    of Conneau & Lample 2019 / mT5, alpha = 0.5): each source's sampling
    weight is ``n_s^alpha / sum(n^alpha)``, boosting low-resource sources
    relative to proportional sampling, and the per-source document budget
    is ``floor(total_target * w_s)``.

    Portability: alpha = 0.5 makes the power an IEEE ``sqrt`` -- the one
    correctly-rounded non-arithmetic op, so bit-exact in any engine --
    and each ``sqrt(n_s)`` is floor-quantized to an integer at
    ``quantum`` resolution so the cross-source SUM is integer (order-
    free); weights and budgets then come from one double division /
    integer cross-multiplication.  The whole relation is #sources rows
    off ONE count aggregation -- the corpus is scanned once and never
    shuffled wider than the groupBy.

    Output per source: n_docs, weight, target_docs.
    """
    counts = docs.groupBy(key).agg(F.count(F.lit(1)).alias("n_docs"))
    q = F.floor(
        F.sqrt(F.col("n_docs").cast("double")) * F.lit(float(quantum))
    ).cast("long")
    quantized = counts.withColumn("__q", q)
    tot = quantized.agg(F.sum("__q").alias("__tq"))
    return (
        quantized.crossJoin(F.broadcast(tot))
        .select(
            key,
            "n_docs",
            (F.col("__q").cast("double") / F.col("__tq").cast("double"))
            .alias("weight"),
            # integer DIV, not double /: a double quotient could round
            # across the floor boundary the oracle's // never crosses
            F.expr(f"({total_target} * __q) DIV __tq").alias("target_docs"),
        )
    )


def sql_temperature_mixture(
    src: str = "documents",
    key: str = "source",
    total_target: int = 1000,
    quantum: int = 1_000_000_000,
) -> str:
    q = f"CAST(FLOOR(sqrt(CAST(n_docs AS DOUBLE)) * {float(quantum)}) AS BIGINT)"
    return f"""
        WITH counts AS (SELECT {key}, COUNT(*) AS n_docs
                        FROM {src} GROUP BY {key}),
        quant AS (SELECT {key}, n_docs, {q} AS q FROM counts),
        tot AS (SELECT CAST(SUM(q) AS BIGINT) AS tq FROM quant)
        SELECT {key}, CAST(n_docs AS BIGINT) AS n_docs,
               CAST(q AS DOUBLE) / CAST(tq AS DOUBLE) AS weight,
               CAST(({total_target} * q) // tq AS BIGINT) AS target_docs
        FROM quant CROSS JOIN tot
    """


def unimax_mixture(
    docs: DataFrame,
    budget_tokens: int = 200_000,
    epoch_cap: int = 4,
    key: str = "source",
    text: str = "text",
) -> DataFrame:
    """UniMax mixture allocation (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): distribute a total token ``budget`` across sources as
    uniformly as possible, but never ask any source for more than
    ``epoch_cap`` epochs of its own data -- the waterfilling that
    temperature sampling approximates without a hard repeat bound.

    Exact integer waterfilling instead of the paper's iterative loop:
    with sources sorted ascending by ``cap_s = epoch_cap * n_tokens_s``,
    source ``i`` is capped iff ``cap_i * (k - i) + S_i <= B`` (``S_i`` the
    running cap prefix sum) -- the condition is monotone in ``i`` (its
    increment is ``(cap_{i+1} - cap_i) * (k - i) >= 0``), so the capped
    set is a prefix and one window pass finds it.  Uncapped sources share
    the remainder by integer DIV (portable truncation; the discarded
    remainder is < #sources tokens).  All decisions are integer
    arithmetic; ``epochs`` is the single IEEE division, reporting only.

    The corpus is scanned once for per-source token counts; everything
    after runs on the #sources-row aggregate (O(10^2) rows by nature, so
    its global windows sort a model-sized relation, not the corpus).
    """
    per = docs.groupBy(key).agg(
        F.sum(F.size(tokens(text))).alias("n_tokens")
    )
    c = per.select(
        key,
        "n_tokens",
        (F.lit(epoch_cap) * F.col("n_tokens")).alias("cap_tokens"),
    )
    wo = Window.orderBy("cap_tokens", key).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    ranked = c.select(
        key,
        "n_tokens",
        "cap_tokens",
        F.row_number()
        .over(Window.orderBy("cap_tokens", key))
        .cast("long")
        .alias("__i"),
        F.sum("cap_tokens").over(wo).alias("__s"),
        F.count(F.lit(1)).over(wall).alias("__k"),
    )
    flagged = ranked.withColumn(
        "capped",
        (
            F.col("cap_tokens") * (F.col("__k") - F.col("__i"))
            + F.col("__s")
        )
        <= F.lit(budget_tokens),
    )
    g = flagged.select(
        "*",
        F.coalesce(
            F.max(F.when(F.col("capped"), F.col("__i"))).over(wall),
            F.lit(0).cast("long"),
        ).alias("__istar"),
        F.coalesce(
            F.max(F.when(F.col("capped"), F.col("__s"))).over(wall),
            F.lit(0).cast("long"),
        ).alias("__sstar"),
    )
    alloc = F.when(F.col("capped"), F.col("cap_tokens")).otherwise(
        F.expr(
            f"({budget_tokens} - __sstar) div nullif(__k - __istar, 0)"
        )
    )
    return g.select(
        key,
        "n_tokens",
        "cap_tokens",
        "capped",
        alloc.alias("alloc_tokens"),
        F.when(
            F.col("n_tokens") > 0,
            alloc.cast("double") / F.col("n_tokens").cast("double"),
        ).alias("epochs"),
    )


def sql_unimax_mixture(
    src: str = "documents",
    key: str = "source",
    budget_tokens: int = 200_000,
    epoch_cap: int = 4,
) -> str:
    """DuckDB twin of :func:`unimax_mixture` (same integer waterfilling;
    window SUM/COUNT cast from DuckDB's HUGEINT back to BIGINT)."""
    alloc = (
        "CASE WHEN capped THEN cap_tokens ELSE "
        f"({budget_tokens} - sstar) // NULLIF(k - istar, 0) END"
    )
    return f"""
        WITH per AS (SELECT {key},
                            CAST(SUM(len({sql_tokens('text')})) AS BIGINT)
                                AS n_tokens
                     FROM {src} GROUP BY {key}),
        c AS (SELECT {key}, n_tokens,
                     {epoch_cap} * n_tokens AS cap_tokens FROM per),
        w AS (SELECT *,
                     CAST(ROW_NUMBER() OVER (ORDER BY cap_tokens, {key})
                          AS BIGINT) AS i,
                     CAST(SUM(cap_tokens) OVER (ORDER BY cap_tokens, {key}
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s,
                     CAST(COUNT(*) OVER () AS BIGINT) AS k
              FROM c),
        f AS (SELECT *, (cap_tokens * (k - i) + s <= {budget_tokens})
                            AS capped FROM w),
        g AS (SELECT *,
                     COALESCE(MAX(CASE WHEN capped THEN i END) OVER (), 0)
                         AS istar,
                     COALESCE(MAX(CASE WHEN capped THEN s END) OVER (), 0)
                         AS sstar
              FROM f)
        SELECT {key}, n_tokens, cap_tokens, capped,
               {alloc} AS alloc_tokens,
               CASE WHEN n_tokens > 0 THEN
                   CAST({alloc} AS DOUBLE) / CAST(n_tokens AS DOUBLE)
               END AS epochs
        FROM g
    """


def chunk_documents(
    docs: DataFrame,
    budget: int = 64,
    overlap: int = 16,
    text: str = "text",
) -> DataFrame:
    """Intra-document sliding-window chunking: split each document into
    token spans of at most ``budget`` tokens whose starts step by
    ``budget - overlap`` (the context-window chunker for embedding /
    retrieval corpora; :func:`pack_sequences` is the INTER-document
    packer).

    Pure generate-side work: one ``sequence()`` + ``explode`` per doc,
    no shuffle at all — chunk spans derive from the doc's own token
    count.  Returns (doc_id, chunk_idx, token_start, token_len,
    n_tokens); the final chunk is short iff the doc doesn't fill it.
    """
    if not 0 <= overlap < budget:
        raise ValueError("need 0 <= overlap < budget")
    step = budget - overlap
    n = F.size(tokens(text)).cast("long")
    base = docs.select("doc_id", n.alias("n_tokens"))
    # starts: 0, step, 2*step, ... strictly below n_tokens
    starts = F.sequence(
        F.lit(0).cast("long"),
        ((F.col("n_tokens") - 1) / step).cast("long") * step,
        F.lit(step).cast("long"),
    )
    ex = base.select(
        "doc_id", "n_tokens", F.posexplode(starts).alias("chunk_idx", "token_start")
    )
    return ex.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "token_start",
        F.least(F.lit(budget).cast("long"),
                F.col("n_tokens") - F.col("token_start")).alias("token_len"),
        "n_tokens",
    )


def sql_chunk_documents(
    src: str = "documents", budget: int = 64, overlap: int = 16
) -> str:
    step = budget - overlap
    return f"""
        WITH base AS (
            SELECT doc_id,
                   CAST(len({sql_tokens('text')}) AS BIGINT) AS n_tokens
            FROM {src}),
        ex AS (
            SELECT doc_id, n_tokens,
                   unnest(generate_series(0, ((n_tokens - 1) // {step}) * {step},
                                          {step})) AS token_start
            FROM base)
        SELECT doc_id,
               CAST(token_start // {step} AS BIGINT) AS chunk_idx,
               CAST(token_start AS BIGINT) AS token_start,
               CAST(LEAST({budget}, n_tokens - token_start) AS BIGINT)
                   AS token_len,
               n_tokens
        FROM ex
    """


#: C4 cleanup constants (Raffel et al. 2020, "Exploring the Limits of
#: Transfer Learning...", §2.2): a line survives iff it ends in terminal
#: punctuation AND has >= 5 words; a page survives iff >= 3 sentences,
#: no '{', no 'lorem ipsum', no blocklisted word.  The public blocklist
#: (LDNOOBW) is not vendored; a tiny documented placeholder keeps the
#: rule exercised — swap the real list in production.
C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3
C4_TERMINAL_RE = r'[.!?"]$'
C4_BLOCKLIST = ["badword", "lorem"]


def c4_quality(docs: DataFrame, text: str = "text") -> DataFrame:
    """C4 page-cleanup rules as pure column expressions (zero shuffles).

    Per document: split into lines; a line is KEPT iff it ends in
    terminal punctuation (``. ! ? "``) and has at least 5 whitespace
    words; page-level flags fire on fewer than 3 sentences (terminal
    punctuation marks across the page), a curly brace (code), the
    literal phrase ``lorem ipsum``, or a blocklist hit among the page's
    words.  ``keep`` = at least one kept line and no page flag — the
    published C4 pipeline's per-page outcome.  Counts are exact
    integers; the kept-char ratio is one double division.

    Returns (doc_id, n_lines, n_kept_lines, kept_chars, total_chars,
    n_sentences, flag_few_sentences, flag_curly, flag_lorem,
    flag_blocklist, kept_frac, keep).
    """
    from ..functions.text import bind1

    t = F.col(text)
    lines = F.split(t, "\n")
    low = F.lower(t)

    def line_ok(x):
        return x.rlike(C4_TERMINAL_RE) & (
            F.size(F.split(F.trim(x), " +")) >= C4_MIN_LINE_WORDS
        )

    # bind the kept-lines array ONCE (r11): the filter re-splits and
    # regex-tests every line of the page, and the inline tree was
    # re-evaluated for kept_chars, n_kept_lines AND the keep flag.
    # bind1 makes each reference a bound-value read; values unchanged.
    kept = bind1(
        F.filter(lines, line_ok),
        lambda k: F.struct(
            F.size(k).cast("long").alias("n"),
            F.aggregate(
                F.transform(k, lambda x: F.length(x)),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            ).alias("chars"),
        ),
    )
    # the page-level signals are likewise materialized once: the
    # sentence regexp, the blocklist scan and the lowered text each
    # used to be re-evaluated for their output column AND inside keep
    words = tokens(text)
    block = F.array(*[F.lit(b) for b in C4_BLOCKLIST])
    page = F.struct(
        (F.length(t) - F.length(F.regexp_replace(t, r"[.!?]", "")))
        .cast("long")
        .alias("n_sent"),
        (
            F.size(F.filter(words, lambda x: F.array_contains(block, x)))
            > 0
        ).alias("block"),
        low.contains("{").alias("curly"),
        low.contains("lorem ipsum").alias("lorem"),
    )
    docs = docs.withColumn("__kept", kept).withColumn("__page", page)
    kept_chars = F.col("__kept")["chars"]
    n_kept = F.col("__kept")["n"]
    n_sent = F.col("__page")["n_sent"]
    flag_block = F.col("__page")["block"]
    flag_few = n_sent < C4_MIN_SENTENCES
    flag_curly = F.col("__page")["curly"]
    flag_lorem = F.col("__page")["lorem"]
    keep = (
        (n_kept > 0) & ~flag_few & ~flag_curly & ~flag_lorem & ~flag_block
    )
    return docs.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        n_kept.alias("n_kept_lines"),
        kept_chars.alias("kept_chars"),
        F.length(t).cast("long").alias("total_chars"),
        n_sent.alias("n_sentences"),
        flag_few.alias("flag_few_sentences"),
        flag_curly.alias("flag_curly"),
        flag_lorem.alias("flag_lorem"),
        flag_block.alias("flag_blocklist"),
        F.when(
            F.length(t) > 0,
            kept_chars.cast("double") / F.length(t).cast("double"),
        ).alias("kept_frac"),
        keep.alias("keep"),
    )


def sql_c4_quality(src: str = "documents") -> str:
    block_list = ", ".join(f"'{b}'" for b in C4_BLOCKLIST)
    return f"""
        WITH base AS (
            SELECT doc_id, text,
                   string_split(text, chr(10)) AS lines,
                   {sql_tokens('text')} AS words
            FROM {src}),
        per AS (
            SELECT doc_id, text, lines, words,
                   list_filter(lines, x ->
                       regexp_matches(x, '{C4_TERMINAL_RE}')
                       AND len(string_split_regex(trim(x), ' +'))
                           >= {C4_MIN_LINE_WORDS}) AS kept
            FROM base)
        SELECT doc_id,
               CAST(len(lines) AS BIGINT) AS n_lines,
               CAST(len(kept) AS BIGINT) AS n_kept_lines,
               CAST(COALESCE(list_sum(list_transform(kept, x -> len(x))), 0)
                    AS BIGINT) AS kept_chars,
               CAST(len(text) AS BIGINT) AS total_chars,
               CAST(len(text) - len(regexp_replace(text, '[.!?]', '', 'g'))
                    AS BIGINT) AS n_sentences,
               (len(text) - len(regexp_replace(text, '[.!?]', '', 'g')))
                   < {C4_MIN_SENTENCES} AS flag_few_sentences,
               contains(lower(text), '{{') AS flag_curly,
               contains(lower(text), 'lorem ipsum') AS flag_lorem,
               len(list_filter(words, x -> x IN ({block_list}))) > 0
                   AS flag_blocklist,
               CASE WHEN len(text) > 0 THEN
                   CAST(COALESCE(list_sum(list_transform(kept, x -> len(x))),
                                 0) AS DOUBLE) / CAST(len(text) AS DOUBLE)
               END AS kept_frac,
               len(kept) > 0
               AND NOT ((len(text) - len(regexp_replace(text, '[.!?]', '',
                                                        'g')))
                        < {C4_MIN_SENTENCES})
               AND NOT contains(lower(text), '{{')
               AND NOT contains(lower(text), 'lorem ipsum')
               AND NOT (len(list_filter(words, x -> x IN ({block_list})))
                        > 0) AS keep
        FROM per
    """


#: Full Gopher A1.1 repetition thresholds: duplicate line/paragraph
#: fraction > 0.30, their char fractions > 0.20, top {2,3,4}-gram char
#: coverage per GOPHER_TOP_NGRAM, duplicated {5..10}-gram char coverage
#: 0.15/0.14/0.13/0.12/0.11/0.10.
GOPHER_DUP_ELEM = {"line": (3, 10), "para": (3, 10)}
GOPHER_DUP_ELEM_CHAR = {"line": (1, 5), "para": (1, 5)}
GOPHER_DUP_NGRAM_FULL = {
    5: (3, 20), 6: (7, 50), 7: (13, 100), 8: (3, 25), 9: (11, 100),
    10: (1, 10),
}


def gopher_repetition_full(docs: DataFrame, text: str = "text") -> DataFrame:
    """The COMPLETE Gopher A1.1 repetition rule set (12 signals), not
    just the 4-signal core of :func:`gopher_repetition`:

    * duplicate LINE / PARAGRAPH fraction: occurrences beyond the first
      of a repeated line (split on ``\\n``) or paragraph (``\\n\\n``)
      over total elements — and their character fractions over total
      text chars (the datatrove/NeMo accounting: a duplicate occurrence
      contributes its full length);
    * top {2,3,4}-gram character coverage (count x gram word-chars over
      total word chars, the argmax-by-count gram) — same as the core;
    * duplicated {5..10}-gram UNIQUE character coverage: token positions
      covered by any n-gram occurring twice, interval-unioned, over
      total word chars — the exact-coverage form for every n, computed
      from ONE n-tagged posexplode for all six sizes.

    Every flag is an integer cross-multiplication; ``keep`` = none
    fired.  Fractions are reporting-only double divisions.  Shape: the
    line/paragraph and top-gram signals are per-document statistics and
    compute as per-row sorted-run folds in ONE narrow select (zero
    shuffles); only the positional dup {5..10}-gram coverage pays a
    tagged posexplode + keyed shuffles, joined back once — no per-n
    corpus rescan.
    """
    from .dedup import fan_out

    base = fan_out(docs.select("doc_id", F.col(text).alias("__t")))

    # totals, duplicate line/paragraph stats, and top {2,3,4}-grams are
    # all PER-DOCUMENT statistics -> ONE narrow row-local select (zero
    # shuffles, zero joins): sorted-run folds per granularity
    # (_dup_element_stats) and per n (_top_ngram_chars).  The former
    # shape paid, per granularity, an explode + (doc, element) shuffle +
    # per-doc shuffle + a doc-keyed join -- 4 extra corpus-sized
    # exchanges and 4 extra scans of the corpus in the physical plan.
    # min_count=2: the full rule set only scores a top gram that
    # actually repeats.
    # materialize each stat struct ONCE (r11): referencing lstat/pstat
    # per field in the select re-ran the whole sort+fold three times
    # per granularity
    staged = base.withColumn(
        "__lstat", _dup_element_stats(F.split("__t", "\n"))
    ).withColumn("__pstat", _dup_element_stats(F.split("__t", "\n\n")))
    lstat = F.col("__lstat")
    pstat = F.col("__pstat")
    rowlocal = staged.select(
        "doc_id",
        _word_chars(tokens("__t")).alias("total_word_chars"),
        F.length("__t").cast("long").alias("total_chars"),
        lstat["n"].alias("n_line"),
        lstat["dup"].alias("dup_line"),
        lstat["dup_chars"].alias("dup_line_chars"),
        pstat["n"].alias("n_para"),
        pstat["dup"].alias("dup_para"),
        pstat["dup_chars"].alias("dup_para_chars"),
        *[
            _top_ngram_chars(n, min_count=2).alias(f"top{n}_chars")
            for n in (2, 3, 4)
        ],
    )

    # dup {5..10}-grams: ONE n-tagged posexplode; coverage per (doc, n)
    def _ptag(n: int):
        return lambda s, i: F.struct(
            F.lit(n).alias("n"), i.alias("pos"), s.alias("s")
        )

    ptagged = F.flatten(
        F.array(
            *[
                F.transform(shingles("__t", n), _ptag(n))
                for n in GOPHER_DUP_NGRAM_FULL
            ]
        )
    )
    g = base.select("doc_id", F.explode(ptagged).alias("g")).select(
        "doc_id",
        F.col("g.n").alias("n"),
        F.col("g.pos").alias("pos"),
        F.col("g.s").alias("s"),
    )
    dup_occ = g.withColumn(
        "c", F.count(F.lit(1)).over(Window.partitionBy("doc_id", "n", "s"))
    ).filter(F.col("c") >= 2)
    cov = dup_occ.select(
        "doc_id",
        "n",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.col("n") - 1)
        ).alias("idx"),
    ).distinct()
    tok_pos = base.select(
        "doc_id", F.posexplode(tokens("__t")).alias("idx", "tok")
    )
    dupn = (
        cov.join(tok_pos, ["doc_id", "idx"])
        .groupBy("doc_id")
        .agg(
            *[
                F.coalesce(
                    F.sum(
                        F.when(F.col("n") == n, F.length("tok"))
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"dup{n}_chars")
                for n in GOPHER_DUP_NGRAM_FULL
            ]
        )
    )

    out = (
        rowlocal.join(dupn, "doc_id", "left")
        .na.fill(
            {f"top{n}_chars": 0 for n in (2, 3, 4)}
            | {f"dup{n}_chars": 0 for n in GOPHER_DUP_NGRAM_FULL}
            | {"dup_line": 0, "dup_line_chars": 0, "dup_para": 0,
               "dup_para_chars": 0}
        )
    )
    twc, tc = F.col("total_word_chars"), F.col("total_chars")
    flag_exprs = []
    for tag in ("line", "para"):
        en, ed = GOPHER_DUP_ELEM[tag]
        cn, cd = GOPHER_DUP_ELEM_CHAR[tag]
        flag_exprs.append(
            (f"flag_dup_{tag}",
             F.col(f"dup_{tag}") * ed > F.col(f"n_{tag}") * en)
        )
        flag_exprs.append(
            (f"flag_dup_{tag}_chars",
             F.col(f"dup_{tag}_chars") * cd > tc * cn)
        )
    for n, (num, den) in GOPHER_TOP_NGRAM.items():
        flag_exprs.append(
            (f"flag_top{n}", F.col(f"top{n}_chars") * den > twc * num)
        )
    for n, (num, den) in GOPHER_DUP_NGRAM_FULL.items():
        flag_exprs.append(
            (f"flag_dup{n}", F.col(f"dup{n}_chars") * den > twc * num)
        )
    any_flag = flag_exprs[0][1]
    for _, e in flag_exprs[1:]:
        any_flag = any_flag | e
    return out.select(
        "doc_id",
        "total_word_chars",
        "total_chars",
        "n_line",
        "dup_line",
        "dup_line_chars",
        "n_para",
        "dup_para",
        "dup_para_chars",
        *[F.col(f"top{n}_chars") for n in (2, 3, 4)],
        *[F.col(f"dup{n}_chars") for n in GOPHER_DUP_NGRAM_FULL],
        *[e.alias(name) for name, e in flag_exprs],
        (~any_flag).alias("keep"),
    )


def sql_gopher_repetition_full(src: str = "documents") -> str:
    """DuckDB twin of :func:`gopher_repetition_full`."""
    dup_ns = list(GOPHER_DUP_NGRAM_FULL)
    gram_selects = " UNION ALL ".join(
        f"SELECT doc_id, {n} AS n, unnest({sql_shingles('w', n)}) AS s FROM words"
        for n in (2, 3, 4)
    )
    pos_selects = " UNION ALL ".join(
        f"""SELECT doc_id, {n} AS n,
                   unnest({sql_shingles('w', n)}) AS s,
                   unnest(range(len({sql_shingles('w', n)}))) AS pos
            FROM words"""
        for n in dup_ns
    )
    dupn_cols = ",\n                    ".join(
        f"COALESCE(SUM(CASE WHEN n = {n} THEN tl END), 0) AS dup{n}_chars"
        for n in dup_ns
    )
    flag_terms = []
    for tag in ("line", "para"):
        en, ed = GOPHER_DUP_ELEM[tag]
        cn, cd = GOPHER_DUP_ELEM_CHAR[tag]
        flag_terms.append(
            (f"flag_dup_{tag}",
             f"COALESCE(l_{tag}.dup_{tag}, 0) * {ed} "
             f"> COALESCE(l_{tag}.n_{tag}, 0) * {en}")
        )
        flag_terms.append(
            (f"flag_dup_{tag}_chars",
             f"COALESCE(l_{tag}.dup_{tag}_chars, 0) * {cd} "
             f"> t.total_chars * {cn}")
        )
    for n, (num, den) in GOPHER_TOP_NGRAM.items():
        flag_terms.append(
            (f"flag_top{n}",
             f"COALESCE(tw.top{n}_chars, 0) * {den} "
             f"> t.total_word_chars * {num}")
        )
    for n, (num, den) in GOPHER_DUP_NGRAM_FULL.items():
        flag_terms.append(
            (f"flag_dup{n}",
             f"COALESCE(dn.dup{n}_chars, 0) * {den} "
             f"> t.total_word_chars * {num}")
        )
    flag_sql = ",\n               ".join(
        f"{e} AS {name}" for name, e in flag_terms
    )
    any_flag = "\n                    OR ".join(e for _, e in flag_terms)
    return f"""
        WITH words AS (SELECT doc_id, {sql_tokens('text')} AS w FROM {src}),
        totals AS (SELECT doc_id,
                          CAST(list_sum(list_transform(
                              {sql_tokens('text')}, x -> len(x)))
                               AS BIGINT) AS total_word_chars,
                          CAST(len(text) AS BIGINT) AS total_chars
                   FROM {src}),
        line_el AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS e
                    FROM {src}),
        line_per AS (SELECT doc_id, e, COUNT(*) AS c FROM line_el
                     GROUP BY doc_id, e),
        l_line AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_line,
                          CAST(SUM(c - 1) AS BIGINT) AS dup_line,
                          CAST(SUM((c - 1) * len(e)) AS BIGINT)
                              AS dup_line_chars
                   FROM line_per GROUP BY doc_id),
        para_el AS (SELECT doc_id,
                           unnest(string_split(text, chr(10) || chr(10)))
                               AS e
                    FROM {src}),
        para_per AS (SELECT doc_id, e, COUNT(*) AS c FROM para_el
                     GROUP BY doc_id, e),
        l_para AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_para,
                          CAST(SUM(c - 1) AS BIGINT) AS dup_para,
                          CAST(SUM((c - 1) * len(e)) AS BIGINT)
                              AS dup_para_chars
                   FROM para_per GROUP BY doc_id),
        grams AS ({gram_selects}),
        per AS (SELECT doc_id, n, s, COUNT(*) AS c,
                       len(s) - (n - 1) AS gc,
                       ROW_NUMBER() OVER (PARTITION BY doc_id, n
                                          ORDER BY COUNT(*) DESC,
                                                   len(s) - (n - 1) DESC,
                                                   s DESC) AS rn
                FROM grams GROUP BY doc_id, n, s),
        tw AS (SELECT doc_id,
                      COALESCE(MAX(CASE WHEN n = 2 AND rn = 1 AND c >= 2
                                        THEN c * gc END), 0) AS top2_chars,
                      COALESCE(MAX(CASE WHEN n = 3 AND rn = 1 AND c >= 2
                                        THEN c * gc END), 0) AS top3_chars,
                      COALESCE(MAX(CASE WHEN n = 4 AND rn = 1 AND c >= 2
                                        THEN c * gc END), 0) AS top4_chars
               FROM per GROUP BY doc_id),
        pg AS ({pos_selects}),
        dup_occ AS (SELECT doc_id, n, pos
                    FROM (SELECT doc_id, n, pos,
                                 COUNT(*) OVER (PARTITION BY doc_id, n, s)
                                     AS c
                          FROM pg) q WHERE c >= 2),
        cov AS (SELECT DISTINCT doc_id, n,
                       unnest(range(pos, pos + n)) AS idx
                FROM dup_occ),
        toklen AS (SELECT doc_id, unnest(range(len(w))) AS idx,
                          unnest(list_transform(w, x -> len(x))) AS tl
                   FROM words),
        dn AS (SELECT c2.doc_id,
                    {dupn_cols}
               FROM (SELECT cov.doc_id, cov.n, t3.tl
                     FROM cov JOIN toklen t3
                       ON t3.doc_id = cov.doc_id AND t3.idx = cov.idx) c2
               GROUP BY c2.doc_id)
        SELECT t.doc_id, t.total_word_chars, t.total_chars,
               COALESCE(l_line.n_line, 0) AS n_line,
               COALESCE(l_line.dup_line, 0) AS dup_line,
               COALESCE(l_line.dup_line_chars, 0) AS dup_line_chars,
               COALESCE(l_para.n_para, 0) AS n_para,
               COALESCE(l_para.dup_para, 0) AS dup_para,
               COALESCE(l_para.dup_para_chars, 0) AS dup_para_chars,
               CAST(COALESCE(tw.top2_chars, 0) AS BIGINT) AS top2_chars,
               CAST(COALESCE(tw.top3_chars, 0) AS BIGINT) AS top3_chars,
               CAST(COALESCE(tw.top4_chars, 0) AS BIGINT) AS top4_chars,
               {", ".join(f'CAST(COALESCE(dn.dup{n}_chars, 0) AS BIGINT) AS dup{n}_chars' for n in dup_ns)},
               {flag_sql},
               NOT ({any_flag}) AS keep
        FROM totals t
        LEFT JOIN l_line ON l_line.doc_id = t.doc_id
        LEFT JOIN l_para ON l_para.doc_id = t.doc_id
        LEFT JOIN tw ON tw.doc_id = t.doc_id
        LEFT JOIN dn ON dn.doc_id = t.doc_id
    """


def filter_audit(docs: DataFrame, key: str = "source") -> DataFrame:
    """The filter-funnel report every curation run prints before anyone
    trusts it: per ``key``, how many documents and tokens the Gopher and
    C4 quality stacks each remove, and what survives both -- the "what
    did my filters delete" audit that catches a filter silently nuking a
    source (the practical failure mode of quality filtering at scale).

    Pure composition: both quality relations are zero-shuffle column
    expressions over the same scan, joined back on doc_id and collapsed
    by ONE #sources-row aggregation.  All counts integer-exact.

    Output per key: docs_total, tokens_total, docs_pass_gopher,
    docs_pass_c4, docs_pass_both, tokens_pass_both.
    """
    g = gopher_quality(docs).select(
        "doc_id", "n_words", F.col("keep").alias("keep_gopher")
    )
    c = c4_quality(docs).select("doc_id", F.col("keep").alias("keep_c4"))
    j = docs.select("doc_id", key).join(g, "doc_id").join(c, "doc_id")
    both = F.col("keep_gopher") & F.col("keep_c4")
    return j.groupBy(key).agg(
        F.count(F.lit(1)).alias("docs_total"),
        F.sum("n_words").alias("tokens_total"),
        F.count_if(F.col("keep_gopher")).alias("docs_pass_gopher"),
        F.count_if(F.col("keep_c4")).alias("docs_pass_c4"),
        F.count_if(both).alias("docs_pass_both"),
        F.coalesce(
            F.sum(F.when(both, F.col("n_words"))), F.lit(0).cast("long")
        ).alias("tokens_pass_both"),
    )


def sql_filter_audit(src: str = "documents", key: str = "source") -> str:
    """DuckDB twin of :func:`filter_audit` (the two quality oracles as
    CTEs; BIGINT casts guard the HUGEINT sum promotion)."""
    return f"""
        WITH g AS ({sql_gopher_quality(src)}),
        c AS ({sql_c4_quality(src)}),
        j AS (SELECT d.{key}, g.n_words,
                     g.keep AS keep_gopher, c.keep AS keep_c4
              FROM {src} d
              JOIN g ON g.doc_id = d.doc_id
              JOIN c ON c.doc_id = d.doc_id)
        SELECT {key},
               COUNT(*) AS docs_total,
               CAST(SUM(n_words) AS BIGINT) AS tokens_total,
               CAST(SUM(CASE WHEN keep_gopher THEN 1 ELSE 0 END) AS BIGINT)
                   AS docs_pass_gopher,
               CAST(SUM(CASE WHEN keep_c4 THEN 1 ELSE 0 END) AS BIGINT)
                   AS docs_pass_c4,
               CAST(SUM(CASE WHEN keep_gopher AND keep_c4 THEN 1 ELSE 0 END)
                    AS BIGINT) AS docs_pass_both,
               CAST(COALESCE(SUM(CASE WHEN keep_gopher AND keep_c4
                                      THEN n_words END), 0) AS BIGINT)
                   AS tokens_pass_both
        FROM j GROUP BY {key}
    """


def doremi_mixture(
    docs: DataFrame,
    n_rounds: int = 3,
    key: str = "source",
    text: str = "text",
) -> DataFrame:
    """Domain-mixture OPTIMIZATION by multiplicative weights -- the
    DoReMi shape (Xie et al. 2023: reweight pretraining domains by
    iterated excess loss) in this engine's bit-portable dialect.
    :func:`temperature_mixture` SETS weights from counts in one shot;
    this operator ITERATES them: each round upweights the domains most
    DIVERGENT from the current weighted mixture, i.e. the domains the
    mixture currently underserves.

    Documented deviations from the paper, both for engine portability:
    the per-domain signal is the total-variation distance between the
    domain's unigram distribution and the CURRENT weighted mixture
    (DoReMi's proxy-model excess loss needs GPU training inside the
    loop; TV-vs-mixture preserves the fixed-point character -- the
    signal moves every round because the mixture moves); and the
    exponentiated-gradient update ``w * exp(eta * L)`` is linearized to
    ``w * (1 + eta * L)`` (``exp`` is the one non-portable op; first
    order in eta they agree).  All arithmetic is INTEGER: probabilities
    floor-quantized to a 1e6 grid, weights renormalized by integer
    division each round (floor; the sum may undershoot the 1e6 budget
    by < n_domains -- the temperature_mixture convention).

    Plan: the (domain, token) probability relation builds once
    (vocab-bounded, localCheckpointed); each round is ONE distributed
    pass -- mixture = weights broadcast into a vocab-sized groupBy,
    per-domain TV numerators one vocab-sized join-aggregate -- and the
    weight update itself is O(n_domains) driver model state (the
    kmeans/perceptron convention).  Output: the full weight trajectory
    (source, round, w_q), rounds 0..n_rounds.
    """
    SCALE = 1_000_000  # weight budget, probability grid, and eta=1
    toks = docs.select(key, F.explode(tokens(text)).alias("tok"))
    st = toks.groupBy(key, "tok").agg(F.count(F.lit(1)).alias("c_st"))
    src_tot = st.groupBy(key).agg(F.sum("c_st").alias("n_s"))
    pq = (
        st.join(F.broadcast(src_tot), key)
        .select(
            key,
            "tok",
            F.expr(f"c_st * {SCALE} DIV n_s").cast("long").alias("p"),
        )
        .localCheckpoint(eager=True)
    )
    spark = docs.sparkSession
    sources = sorted(r[key] for r in src_tot.select(key).collect())
    w = {s: SCALE // len(sources) for s in sources}
    history = [(s, 0, w[s]) for s in sources]
    for r in range(1, n_rounds + 1):
        s_tot = sum(w.values())
        wdf = spark.createDataFrame(
            [(s, w[s]) for s in sources], f"{key} string, w long"
        )
        m = (
            pq.join(F.broadcast(wdf), key)
            .groupBy("tok")
            .agg(F.sum(F.col("p") * F.col("w")).alias("m"))
            .localCheckpoint(eager=True)
        )
        m_tot = m.agg(F.sum("m")).first()[0]
        agg = {
            row[key]: (row["a_in"], row["m_in"])
            for row in pq.join(m, "tok")
            .groupBy(key)
            .agg(
                F.sum(F.abs(F.col("p") * F.lit(s_tot) - F.col("m")))
                .alias("a_in"),
                F.sum("m").alias("m_in"),
            )
            .collect()
        }
        raw = {}
        for s in sources:
            a_in, m_in = agg.get(s, (0, 0))
            a = (m_tot - m_in) + a_in
            factor = SCALE + (SCALE * a) // (2 * SCALE * s_tot)
            raw[s] = w[s] * factor
        raw_tot = sum(raw.values())
        w = {s: (SCALE * raw[s]) // raw_tot for s in sources}
        history.extend((s, r, w[s]) for s in sources)
    return spark.createDataFrame(
        history, f"{key} string, round long, w_q long"
    )


def sql_doremi_mixture(
    src: str = "documents", n_rounds: int = 3, key: str = "source"
) -> str:
    """DuckDB twin of :func:`doremi_mixture`: the multiplicative-weights
    loop unrolled as a CTE chain (the perceptron_train discipline);
    every SUM cast to BIGINT, every division integer ``//``.  Round
    CTEs are MATERIALIZED: DuckDB inlines CTEs by default, and an
    unrolled loop whose every round references the previous round 3-4
    times re-evaluates the whole corpus scan exponentially often
    (measured 181 s at sf0.01 inlined -> sub-second materialized)."""
    SCALE = 1_000_000
    parts = [
        f"""toks AS (SELECT {key}, unnest({sql_tokens('text')}) AS tok
                     FROM {src})""",
        f"""st AS (SELECT {key}, tok, COUNT(*) AS c_st
                   FROM toks GROUP BY {key}, tok)""",
        f"""src_tot AS (SELECT {key}, CAST(SUM(c_st) AS BIGINT) AS n_s
                        FROM st GROUP BY {key})""",
        f"""pq AS MATERIALIZED (SELECT st.{key}, st.tok,
                          CAST((st.c_st * {SCALE}) // t.n_s AS BIGINT) AS p
                   FROM st JOIN src_tot t USING ({key}))""",
        f"""w0 AS MATERIALIZED (SELECT {key},
                          CAST({SCALE} // (SELECT COUNT(*) FROM src_tot)
                               AS BIGINT) AS w
                   FROM src_tot)""",
    ]
    for r in range(1, n_rounds + 1):
        parts += [
            f"""s{r} AS MATERIALIZED (SELECT CAST(SUM(w) AS BIGINT) AS s
                         FROM w{r - 1})""",
            f"""m{r} AS MATERIALIZED (SELECT pq.tok, CAST(SUM(pq.p * w.w) AS BIGINT) AS m
                         FROM pq JOIN w{r - 1} w USING ({key})
                         GROUP BY pq.tok)""",
            f"""mt{r} AS MATERIALIZED (SELECT CAST(SUM(m) AS BIGINT) AS mtot
                          FROM m{r})""",
            f"""agg{r} AS MATERIALIZED (SELECT pq.{key},
                              CAST(SUM(ABS(pq.p * s.s - m.m))
                                   AS BIGINT) AS a_in,
                              CAST(SUM(m.m) AS BIGINT) AS m_in
                           FROM pq JOIN m{r} m USING (tok)
                           CROSS JOIN s{r} s
                           GROUP BY pq.{key})""",
            f"""raw{r} AS MATERIALIZED (SELECT w.{key},
                              w.w * ({SCALE}
                                  + ({SCALE} * ((mt.mtot - a.m_in) + a.a_in))
                                     // (2 * {SCALE} * s.s)) AS raw
                           FROM w{r - 1} w
                           JOIN agg{r} a USING ({key})
                           CROSS JOIN mt{r} mt CROSS JOIN s{r} s)""",
            f"""w{r} AS MATERIALIZED (SELECT {key},
                             CAST(({SCALE} * raw)
                                  // (SELECT CAST(SUM(raw) AS BIGINT)
                                      FROM raw{r}) AS BIGINT) AS w
                         FROM raw{r})""",
        ]
    unions = "\n            UNION ALL ".join(
        f"SELECT {key}, CAST({r} AS BIGINT) AS round, w AS w_q FROM w{r}"
        for r in range(0, n_rounds + 1)
    )
    ctes = ",\n        ".join(parts)
    return f"""
        WITH {ctes}
        {unions}
    """


def packing_efficiency(
    docs: DataFrame,
    budget: int = 512,
    key: str = "source",
    text: str = "text",
) -> DataFrame:
    """Packer EVAL: per-source fill statistics of the
    :func:`pack_sequences` layout -- chunks produced, tokens laid out,
    and ``fill_ratio`` = tokens / (chunks * budget), the fraction of
    the training batch that is real data rather than padding (the
    number a pretraining run pays for directly).  One #sources-bounded
    aggregate over the packing relation."""
    packed = pack_sequences(docs, budget=budget, key=key, text=text)
    return (
        packed.groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("chunk_id").alias("n_chunks"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .select(
            key,
            "n_docs",
            "n_chunks",
            "n_tokens",
            (F.col("n_tokens").cast("double")
             / (F.col("n_chunks").cast("double") * F.lit(float(budget)))
             ).alias("fill_ratio"),
        )
    )


def sql_packing_efficiency(
    src: str = "documents", budget: int = 512, key: str = "source"
) -> str:
    """DuckDB twin of :func:`packing_efficiency`."""
    return f"""
        WITH packed AS ({sql_pack_sequences(src=src, budget=budget,
                                            key=key)})
        SELECT {key},
               COUNT(*) AS n_docs,
               CAST(COUNT(DISTINCT chunk_id) AS BIGINT) AS n_chunks,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               CAST(SUM(n_tokens) AS DOUBLE)
                   / (CAST(COUNT(DISTINCT chunk_id) AS DOUBLE)
                      * {float(budget)}) AS fill_ratio
        FROM packed
        GROUP BY {key}
    """
