"""Data-layout operators: Z-order (Morton) clustering and zone-map
pruning statistics -- the write-side half of data skipping at 100 TB.

A table clustered on ONE sort key prunes file scans only for predicates
on that key; interleaving the bits of two bucketized dimensions (the
Morton / Z-order curve Delta and Iceberg cluster by) gives every file a
tight min/max zone on BOTH dimensions, so single-dimension predicates on
either axis skip most files.  :func:`zorder_prune_stats` measures this
directly: simulate both layouts as equal-width file bins (exactly how a
clustered write lays out files -- NO global sort, no window; binning is a
narrow map and zone maps are one small groupBy per layout), compute each
file's zone map, and count the files a predicate box cannot skip.

Everything is integer arithmetic on bucketized coordinates (range
anchors ride as a 1-row crossJoin aggregate), so the whole relation is
bit-portable to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(x: Column, y: Column, bits: int = 4) -> Column:
    """Interleave the low ``bits`` bits of x and y: x bit j lands at
    position 2j, y bit j at 2j+1 -- the Z-order curve key."""
    terms = []
    for j in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, j).bitwiseAND(F.lit(1)), 2 * j))
        terms.append(
            F.shiftleft(F.shiftright(y, j).bitwiseAND(F.lit(1)), 2 * j + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def sql_morton_code(x: str, y: str, bits: int = 4) -> str:
    terms = []
    for j in range(bits):
        terms.append(f"((({x} >> {j}) & 1) << {2 * j})")
        terms.append(f"((({y} >> {j}) & 1) << {2 * j + 1})")
    return "(" + " + ".join(terms) + ")"


def _prune_stats_onepass(
    coded: DataFrame,
    layouts: dict[str, Column],
    lo: int,
    hi: int,
) -> DataFrame:
    """ONE-pass prune-stats kernel shared by :func:`zorder_prune_stats`
    and :func:`hilbert_prune_stats`.

    The former per-(layout, predicate) loop evaluated ``coded`` (a scan
    plus the broadcast anchors aggregate) once per rows_selected
    predicate and once per layout x predicate zone branch -- 6 scans of
    the source for the 2-layout form, 134 plan operators.  Every number
    in the output is derivable in a single pass: explode each row into
    one (layout, file_id) struct per layout, zone-map with per-file
    in-band row counts in one groupBy, fold to per-layout totals in a
    second groupBy, and unpivot the two predicates back into rows.  All
    counts stay BIGINT end to end, so the values are bit-identical to
    the looped form (integers; min/max/sum/count commute with the
    regrouping)."""
    lf = F.explode(
        F.array(*[
            F.struct(
                F.lit(lname).alias("layout"),
                fexpr.cast("long").alias("file_id"),
            )
            for lname, fexpr in layouts.items()
        ])
    ).alias("lf")
    in_x = (F.col("x") >= lo) & (F.col("x") <= hi)
    in_y = (F.col("y") >= lo) & (F.col("y") <= hi)
    zones = (
        coded.select(lf, "x", "y")
        .groupBy("lf.layout", "lf.file_id")
        .agg(
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
            F.count_if(in_x).alias("rows_x"),
            F.count_if(in_y).alias("rows_y"),
        )
    )
    per_layout = zones.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("files_total"),
        F.count_if(~((F.col("max_x") < lo) | (F.col("min_x") > hi)))
        .cast("long")
        .alias("scanned_x"),
        F.count_if(~((F.col("max_y") < lo) | (F.col("min_y") > hi)))
        .cast("long")
        .alias("scanned_y"),
        F.sum("rows_x").cast("long").alias("rows_sel_x"),
        F.sum("rows_y").cast("long").alias("rows_sel_y"),
    )
    return per_layout.select(
        "layout",
        F.explode(
            F.array(
                F.struct(
                    F.lit("x_band").alias("predicate"),
                    F.col("scanned_x").alias("files_scanned"),
                    F.col("rows_sel_x").alias("rows_selected"),
                ),
                F.struct(
                    F.lit("y_band").alias("predicate"),
                    F.col("scanned_y").alias("files_scanned"),
                    F.col("rows_sel_y").alias("rows_selected"),
                ),
            )
        ).alias("p"),
        "files_total",
    ).select(
        "layout",
        F.col("p.predicate").alias("predicate"),
        "files_total",
        F.col("p.files_scanned").alias("files_scanned"),
        F.col("p.rows_selected").alias("rows_selected"),
    )


def zorder_prune_stats(
    orders: DataFrame,
    buckets: int = 16,
    band: tuple[int, int] = (4, 7),
) -> DataFrame:
    """File-skipping comparison: linear layout (sorted/binned by one
    dimension) vs Z-order layout, under single-dimension band predicates
    on each axis.

    Dimensions: ``x`` = o_custkey bucketized to [0, buckets) over its
    min..max range, ``y`` = o_orderdate (epoch micros) bucketized the
    same way.  Files: ``buckets`` equal-width bins -- linear layout bins
    by ``x`` alone, Z-order by the Morton code's high bits.  Zone maps
    are each file's (min_x, max_x, min_y, max_y); a file is SCANNED iff
    its zone intersects the predicate band.

    Output (4 rows): layout, predicate, files_total, files_scanned,
    rows_selected.  rows_selected is layout-independent by construction
    -- the same rows match either way; only the scan cost differs, which
    is the entire point of clustering.
    """
    if buckets < 2 or buckets & (buckets - 1):
        raise ValueError(f"buckets must be a power of two >= 2, got {buckets}")
    bits = buckets.bit_length() - 1  # morton interleave covers [0, buckets)
    lo, hi = band
    anchors = orders.agg(
        F.min("o_custkey").alias("min_ck"),
        F.max("o_custkey").alias("max_ck"),
        F.min(F.unix_micros(F.col("o_orderdate"))).alias("min_us"),
        F.max(F.unix_micros(F.col("o_orderdate"))).alias("max_us"),
    )
    # integer DIV, not double division: the epoch-microsecond spread times
    # `buckets` exceeds 2^53, where a double quotient would drift off the
    # oracle's floor division by one bucket at the boundaries
    x = F.expr(
        f"((o_custkey - min_ck) * {buckets}) DIV (max_ck - min_ck + 1)"
    )
    y = F.expr(
        f"((unix_micros(o_orderdate) - min_us) * {buckets})"
        f" DIV (max_us - min_us + 1)"
    )
    coded = (
        orders.crossJoin(F.broadcast(anchors))
        .select(x.cast("long").alias("x"), y.cast("long").alias("y"))
        .select(
            "x", "y", morton_code(F.col("x"), F.col("y"), bits=bits).alias("m")
        )
    )
    # morton spans buckets^2 codes; high bits -> `buckets` equal files
    layouts = {
        "linear_x": F.col("x"),
        "zorder": (F.col("m") / buckets).cast("long"),
    }
    return _prune_stats_onepass(coded, layouts, lo, hi)


def sql_zorder_prune_stats(
    src: str = "orders", buckets: int = 16, band: tuple[int, int] = (4, 7)
) -> str:
    """DuckDB twin of :func:`zorder_prune_stats`."""
    if buckets < 2 or buckets & (buckets - 1):
        raise ValueError(f"buckets must be a power of two >= 2, got {buckets}")
    lo, hi = band
    m = sql_morton_code("x", "y", bits=buckets.bit_length() - 1)
    branches = []
    for lname, fexpr in (("linear_x", "x"), ("zorder", f"m // {buckets}")):
        for pname, pcol in (("x_band", "x"), ("y_band", "y")):
            branches.append(f"""
            SELECT '{lname}' AS layout, '{pname}' AS predicate,
                   (SELECT COUNT(*) FROM (
                        SELECT {fexpr} AS f FROM coded GROUP BY 1))
                       AS files_total,
                   (SELECT COUNT(*) FROM (
                        SELECT {fexpr} AS f,
                               MIN({pcol}) AS mn, MAX({pcol}) AS mx
                        FROM coded GROUP BY 1)
                    WHERE NOT (mx < {lo} OR mn > {hi}))
                       AS files_scanned,
                   (SELECT COUNT(*) FROM coded
                    WHERE {pcol} >= {lo} AND {pcol} <= {hi})
                       AS rows_selected""")
    sel = " UNION ALL ".join(branches)
    return f"""
        WITH anchors AS (
            SELECT MIN(o_custkey) AS min_ck, MAX(o_custkey) AS max_ck,
                   MIN(epoch_us(o_orderdate)) AS min_us,
                   MAX(epoch_us(o_orderdate)) AS max_us
            FROM {src}),
        bucketed AS (
            SELECT ((o_custkey - a.min_ck) * {buckets})
                       // (a.max_ck - a.min_ck + 1) AS x,
                   ((epoch_us(o_orderdate) - a.min_us) * {buckets})
                       // (a.max_us - a.min_us + 1) AS y
            FROM {src} CROSS JOIN anchors a),
        coded AS (SELECT x, y, {m} AS m FROM bucketed)
        {sel}
    """


def hilbert_steps(bits: int) -> list[int]:
    """The fixed unroll of side lengths for a ``bits``-level Hilbert
    walk: s = 2^(bits-1) .. 1."""
    return [1 << (bits - 1 - i) for i in range(bits)]


def hilbert_code_steps(df: DataFrame, bits: int = 4) -> DataFrame:
    """Append Hilbert-curve distance ``hd`` for integer columns (x, y) in
    [0, 2^bits): the standard xy2d walk (Hamilton's iterative form)
    unrolled into ``bits`` chained projections -- each step is pure
    integer CASE/bit arithmetic on (hx, hy, hd), so the whole derivation
    is one narrow codegen stage, bit-identical in any engine.

    Hilbert preserves locality strictly better than Morton (no long
    diagonal jumps), which is why Databricks liquid clustering and
    recent Iceberg orderings prefer it; the measurable payoff is fewer
    files scanned per band predicate (see :func:`hilbert_prune_stats`).
    """
    out = df.select("*", F.col("x").alias("hx"), F.col("y").alias("hy"),
                    F.lit(0).cast("long").alias("hd"))
    for s in hilbert_steps(bits):
        rx = F.when(F.col("hx").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(F.col("hy").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        d2 = F.col("hd") + F.lit(s * s).cast("long") * (
            (F.lit(3) * rx).bitwiseXOR(ry)
        ).cast("long")
        # rotation: ry==0 -> (maybe flip within s) then swap hx/hy.
        # INVARIANT (r6 ADVICE): the s-1 flip acts on the UNMASKED
        # coordinate, so hx/hy go negative in later steps.  That is safe
        # by design: only the low log2(s) bits of the coordinate are
        # ever read again (step s' < s tests hx & s'), and under
        # two's-complement those bits of (s-1-hx) equal the intended
        # complement regardless of sign -- both engines (Spark, DuckDB)
        # use two's-complement BIGINT &, and the full 16x16 grid is
        # pinned against the canonical xy2d walk in both
        # (tests/test_plans.py / the hilbert_prune_stats oracle).
        flip = (ry == 0) & (rx == 1)
        nx = F.when(flip, F.lit(s - 1) - F.col("hx")).otherwise(F.col("hx"))
        ny = F.when(flip, F.lit(s - 1) - F.col("hy")).otherwise(F.col("hy"))
        out = out.select(
            *[c for c in out.columns if c not in ("hx", "hy", "hd")],
            F.when(ry == 0, ny).otherwise(F.col("hx")).alias("hx"),
            F.when(ry == 0, nx).otherwise(F.col("hy")).alias("hy"),
            d2.alias("hd"),
        )
    return out


def sql_hilbert_steps(bits: int = 4) -> str:
    """CTE chain fragment computing ``hd`` from coded(x, y): returns SQL
    text 'h0 AS (...), h1 AS (...), ...' with the final CTE named
    ``h{bits}`` exposing (x, y, m, hd)."""
    parts = [
        "h0 AS (SELECT x, y, m, x AS hx, y AS hy, CAST(0 AS BIGINT) AS hd"
        " FROM coded)"
    ]
    for i, s in enumerate(hilbert_steps(bits)):
        p = i
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        parts.append(f"""
        h{i + 1} AS (
            SELECT x, y, m,
                   CASE WHEN {ry} = 0 THEN
                        CASE WHEN {rx} = 1 THEN {s - 1} - hy ELSE hy END
                        ELSE hx END AS hx,
                   CASE WHEN {ry} = 0 THEN
                        CASE WHEN {rx} = 1 THEN {s - 1} - hx ELSE hx END
                        ELSE hy END AS hy,
                   hd + {s * s} * CAST(xor(3 * {rx}, {ry}) AS BIGINT) AS hd
            FROM h{p})""")
    return ",".join(parts)


def hilbert_prune_stats(
    orders: DataFrame,
    buckets: int = 16,
    band: tuple[int, int] = (4, 7),
) -> DataFrame:
    """Three-way file-skipping comparison -- linear vs Z-order vs Hilbert
    clustering -- under the same single-dimension band predicates as
    :func:`zorder_prune_stats` (same binning, same zone-map scan rule).
    6 rows: {linear_x, zorder, hilbert} x {x_band, y_band}.  The result
    is the layout decision as DATA: Hilbert's strictly-better locality
    shows up (or doesn't, for this distribution) in files_scanned.
    """
    if buckets < 2 or buckets & (buckets - 1):
        raise ValueError(f"buckets must be a power of two >= 2, got {buckets}")
    bits = buckets.bit_length() - 1
    lo, hi = band
    anchors = orders.agg(
        F.min("o_custkey").alias("min_ck"),
        F.max("o_custkey").alias("max_ck"),
        F.min(F.unix_micros(F.col("o_orderdate"))).alias("min_us"),
        F.max(F.unix_micros(F.col("o_orderdate"))).alias("max_us"),
    )
    x = F.expr(
        f"((o_custkey - min_ck) * {buckets}) DIV (max_ck - min_ck + 1)"
    )
    y = F.expr(
        f"((unix_micros(o_orderdate) - min_us) * {buckets})"
        f" DIV (max_us - min_us + 1)"
    )
    coded = (
        orders.crossJoin(F.broadcast(anchors))
        .select(x.cast("long").alias("x"), y.cast("long").alias("y"))
        .select(
            "x", "y", morton_code(F.col("x"), F.col("y"), bits=bits).alias("m")
        )
    )
    coded = hilbert_code_steps(coded, bits=bits).select("x", "y", "m", "hd")
    layouts = {
        "linear_x": F.col("x"),
        "zorder": (F.col("m") / buckets).cast("long"),
        "hilbert": (F.col("hd") / buckets).cast("long"),
    }
    return _prune_stats_onepass(coded, layouts, lo, hi)


def sql_hilbert_prune_stats(
    src: str = "orders", buckets: int = 16, band: tuple[int, int] = (4, 7)
) -> str:
    """DuckDB twin of :func:`hilbert_prune_stats`."""
    if buckets < 2 or buckets & (buckets - 1):
        raise ValueError(f"buckets must be a power of two >= 2, got {buckets}")
    bits = buckets.bit_length() - 1
    lo, hi = band
    m = sql_morton_code("x", "y", bits=bits)
    branches = []
    for lname, fexpr in (
        ("linear_x", "x"),
        ("zorder", f"m // {buckets}"),
        ("hilbert", f"hd // {buckets}"),
    ):
        for pname, pcol in (("x_band", "x"), ("y_band", "y")):
            branches.append(f"""
            SELECT '{lname}' AS layout, '{pname}' AS predicate,
                   (SELECT COUNT(*) FROM (
                        SELECT {fexpr} AS f FROM hfinal GROUP BY 1))
                       AS files_total,
                   (SELECT COUNT(*) FROM (
                        SELECT {fexpr} AS f,
                               MIN({pcol}) AS mn, MAX({pcol}) AS mx
                        FROM hfinal GROUP BY 1)
                    WHERE NOT (mx < {lo} OR mn > {hi}))
                       AS files_scanned,
                   (SELECT COUNT(*) FROM hfinal
                    WHERE {pcol} >= {lo} AND {pcol} <= {hi})
                       AS rows_selected""")
    sel = " UNION ALL ".join(branches)
    return f"""
        WITH anchors AS (
            SELECT MIN(o_custkey) AS min_ck, MAX(o_custkey) AS max_ck,
                   MIN(epoch_us(o_orderdate)) AS min_us,
                   MAX(epoch_us(o_orderdate)) AS max_us
            FROM {src}),
        bucketed AS (
            SELECT ((o_custkey - a.min_ck) * {buckets})
                       // (a.max_ck - a.min_ck + 1) AS x,
                   ((epoch_us(o_orderdate) - a.min_us) * {buckets})
                       // (a.max_us - a.min_us + 1) AS y
            FROM {src} CROSS JOIN anchors a),
        coded AS (SELECT x, y, {m} AS m FROM bucketed),
        {sql_hilbert_steps(bits)},
        hfinal AS (SELECT x, y, m, hd FROM h{bits})
        {sel}
    """
