"""Keyed position accounting and trade PnL mark-to-market (B5/B6).

Ports of ``/root/reference/examples/csp/01_basics/e4_trade_pnl.py``:

* ``Positions`` (e4:19-33): per side, ``total_qty += qty`` and
  ``total_qty_price += qty*price``; average cost = total_qty_price /
  total_qty; PnL = qty * (mid - avg_cost).
* ``Book`` (e4:36-70): quotes update last bid/ask -> mid; every trade is
  marked at the latest mid *as of the trade's event time* (as-of join) and
  positions are re-marked.

Spark shape: positions are a plain keyed aggregation (map-side partial sums,
one shuffle); the mark-to-market is :func:`operators.asof.asof_join` + exact
decimal arithmetic.  Both scale linearly: no global sort, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import dec
from .asof import asof_join, asof_join_bucketed


def positions(
    trades: DataFrame,
    key: str = "side",
    qty: str = "qty",
    price: str = "price",
) -> DataFrame:
    """Final per-key position: total qty, total qty*price, average cost."""
    total_qty = F.sum(dec(qty, 0))
    total_qty_price = F.sum(dec(qty, 0) * dec(price, 2))
    return trades.groupBy(key).agg(
        total_qty.cast("long").alias("total_qty"),
        total_qty_price.cast("double").alias("total_qty_price"),
        (total_qty_price.cast("double") / total_qty.cast("double")).alias("avg_cost"),
    )


def mark_to_market(
    trades: DataFrame,
    quotes: DataFrame,
    on: list[str] | None = None,
    qty: str = "qty",
    price: str = "price",
    mid: str = "mid",
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Each trade marked at the latest quote mid as of its event time:
    ``pnl = qty * (mid - price)`` (decimal-exact).  Trades before any quote
    get null mid/pnl -- the reference's Book likewise has no mark until the
    first quote arrives (e4_trade_pnl.py:55-58).

    ``bucket_seconds`` selects the time-bucketed carry (the skew/unkeyed
    scale path, result-identical -- see ``asof_join_bucketed``)."""
    if bucket_seconds is not None:
        marked = asof_join_bucketed(
            trades, quotes, on=on or [], right_cols=[mid],
            bucket_seconds=bucket_seconds,
        )
    else:
        marked = asof_join(trades, quotes, on=on or [], right_cols=[mid])
    return marked.withColumn(
        "pnl", (dec(qty, 0) * (dec(mid, 2) - dec(price, 2))).cast("double")
    )
