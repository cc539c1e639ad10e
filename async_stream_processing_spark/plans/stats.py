"""ANALYZE-style table statistics: the relation a cost-based optimizer
(and a data engineer sizing a 100 TB job) reads before planning anything.

Per column: row/non-null counts, exact NDV, numeric min/max (timestamps
as epoch micros so every type shares one portable DOUBLE axis), and
string length stats.  ONE corpus scan computes every column's aggregates
together; the multiple exact ``COUNT(DISTINCT)``s make Catalyst plan an
Expand (one duplicated stream per distinct aggregate), which is the
price of exactness and the oracle contract here -- at 100 TB swap
``F.count_distinct`` for ``F.approx_count_distinct`` (HLL, no Expand,
single pass, ~2% error) and keep everything else identical; the
``cardinality_sketch`` query already gates that estimator's exact twin.

Reference parity: the reference engine has no statistics surface; this
is part of the pipeline-operations layer (know your corpus before you
shuffle it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Spark typeName -> portable dtype label (shared with the SQL twin).
_DTYPE_LABEL = {
    "long": "bigint",
    "integer": "bigint",
    "short": "bigint",
    "double": "double",
    "float": "double",
    "timestamp": "timestamp",
    "string": "varchar",
    "boolean": "boolean",
    "date": "date",
}

_NUMERIC = {"long", "integer", "short", "double", "float"}


def table_stats(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column statistics of ``df`` as one row per column.

    Output: (column_name, dtype, n_rows, n_nonnull, ndv, min_numeric,
    max_numeric, min_len, max_len, avg_len).  ``min/max_numeric`` carry
    numeric columns cast to double and timestamps as epoch-microsecond
    doubles; NULL for other types.  Length stats are VARCHAR-only;
    ``avg_len`` is an exact integer sum with one final double division
    (bit-portable).
    """
    fields = [
        (f.name, f.dataType.typeName())
        for f in df.schema.fields
        if cols is None or f.name in cols
    ]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, typ in fields:
        c = F.col(name)
        if typ in _NUMERIC:
            num = c.cast("double")
        elif typ == "timestamp":
            num = F.unix_micros(c).cast("double")
        else:
            num = F.lit(None).cast("double")
        aggs += [
            F.count(c).alias(f"{name}__nn"),
            F.count_distinct(c).alias(f"{name}__ndv"),
            F.min(num).alias(f"{name}__min"),
            F.max(num).alias(f"{name}__max"),
        ]
        if typ == "string":
            ln = F.length(c)
            aggs += [
                F.min(ln).cast("long").alias(f"{name}__minlen"),
                F.max(ln).cast("long").alias(f"{name}__maxlen"),
                F.sum(ln).cast("long").alias(f"{name}__sumlen"),
            ]
    wide = df.agg(*aggs)
    structs = []
    for name, typ in fields:
        has_len = typ == "string"
        structs.append(
            F.struct(
                F.lit(name).alias("column_name"),
                F.lit(_DTYPE_LABEL.get(typ, typ)).alias("dtype"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"{name}__nn").alias("n_nonnull"),
                F.col(f"{name}__ndv").alias("ndv"),
                F.col(f"{name}__min").alias("min_numeric"),
                F.col(f"{name}__max").alias("max_numeric"),
                (F.col(f"{name}__minlen") if has_len
                 else F.lit(None).cast("long")).alias("min_len"),
                (F.col(f"{name}__maxlen") if has_len
                 else F.lit(None).cast("long")).alias("max_len"),
                ((F.col(f"{name}__sumlen").cast("double")
                  / F.col(f"{name}__nn").cast("double")) if has_len
                 else F.lit(None).cast("double")).alias("avg_len"),
            )
        )
    return wide.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def sql_table_stats(src: str, cols: list[tuple[str, str]]) -> str:
    """DuckDB twin of :func:`table_stats`.

    ``cols`` is [(name, dtype_label), ...] with labels from
    ``_DTYPE_LABEL`` -- one UNION ALL branch per column over the same
    aggregates (the oracle optimizes for clarity, not scan count).
    """
    branches = []
    for name, label in cols:
        if label in ("bigint", "double"):
            num = f"CAST({name} AS DOUBLE)"
        elif label == "timestamp":
            num = f"CAST(epoch_us({name}) AS DOUBLE)"
        else:
            num = "CAST(NULL AS DOUBLE)"
        if label == "varchar":
            lens = f"""CAST(MIN(length({name})) AS BIGINT) AS min_len,
                   CAST(MAX(length({name})) AS BIGINT) AS max_len,
                   CAST(SUM(length({name})) AS DOUBLE)
                       / CAST(COUNT({name}) AS DOUBLE) AS avg_len"""
        else:
            lens = """CAST(NULL AS BIGINT) AS min_len,
                   CAST(NULL AS BIGINT) AS max_len,
                   CAST(NULL AS DOUBLE) AS avg_len"""
        branches.append(f"""
            SELECT '{name}' AS column_name, '{label}' AS dtype,
                   COUNT(*) AS n_rows,
                   COUNT({name}) AS n_nonnull,
                   COUNT(DISTINCT {name}) AS ndv,
                   MIN({num}) AS min_numeric,
                   MAX({num}) AS max_numeric,
                   {lens}
            FROM {src}""")
    return " UNION ALL ".join(branches)
