"""Order-independent exact numeric aggregation helpers.

Spark and any SQL oracle (DuckDB) may sum doubles in different association
orders (partial aggregation, segment trees), so raw ``SUM(double)`` is not
bit-reproducible.  Every aggregate this engine exposes therefore works in
**decimal space**: cast the *source columns* to exact ``DECIMAL``, do the
arithmetic (multiply/sum -- exact, order-independent) in decimal, and cast
the final total back to double (deterministic nearest rounding).  This is
also the right call at 100 TB: results stop depending on partitioning, AQE
decisions, or retry order.

CRITICAL portability rule, established empirically against DuckDB: cast
**raw input columns** to decimal, never *computed* doubles.  Spark converts
double->decimal via the double's shortest decimal representation
(``BigDecimal.valueOf``), DuckDB rounds at ~15 significant digits; on noisy
products (e.g. ``147.89 * 26 = 3845.1399999999994``) they disagree in the
last ulp.  Clean source data (currency-like, few significant digits)
converts identically; decimal x decimal arithmetic is then exact in both
engines.

Inputs are ``DECIMAL(18, s)`` so products stay within the 38-digit cap:
(18,6) x (18,0) -> (37,6); (18,6) x (18,6) -> (37,12).

SECOND portability rule: the final decimal -> double conversion must be
exact, i.e. ``|total| * 10^scale < 2^53``.  DuckDB converts decimal->double
as (int128 -> double) / 10^scale -- two roundings -- while Spark rounds the
exact value once; they can land on adjacent doubles when the decimal
carries >15 significant digits.  So pass each column's TRUE scale (the
driver data is 2-dp money, integer quantities), not a paranoid-wide one.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, scale: int = 6) -> Column:
    """Cast a *source* column to an exact decimal (see module rule)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def exact_sum(col: Column | str, scale: int = 6) -> Column:
    """``SUM`` that is bit-identical regardless of evaluation order."""
    return F.sum(dec(col, scale)).cast("double")


def exact_avg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent mean: exact decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c, scale)).cast("double") / F.count(c)).cast("double")


def exact_dot_sum(a: Column | str, b: Column | str, scale_a: int = 6, scale_b: int = 0) -> Column:
    """``SUM(a*b)`` with the product taken in decimal space (exact)."""
    return F.sum(dec(a, scale_a) * dec(b, scale_b)).cast("double")


def sql_dec(expr: str, scale: int = 6) -> str:
    return f"CAST(({expr}) AS DECIMAL(18,{scale}))"


def sql_exact_sum(expr: str, scale: int = 6) -> str:
    """DuckDB-side rendering of :func:`exact_sum` for oracle queries."""
    return f"CAST(SUM({sql_dec(expr, scale)}) AS DOUBLE)"


def sql_exact_avg(expr: str, scale: int = 6) -> str:
    return f"CAST(CAST(SUM({sql_dec(expr, scale)}) AS DOUBLE) / COUNT({expr}) AS DOUBLE)"


def sql_exact_dot_sum(a: str, b: str, scale_a: int = 6, scale_b: int = 0) -> str:
    return f"CAST(SUM({sql_dec(a, scale_a)} * {sql_dec(b, scale_b)}) AS DOUBLE)"
