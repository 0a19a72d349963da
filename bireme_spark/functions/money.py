"""Exact-decimal money arithmetic.

The warehouse money columns are 2-decimal doubles. Summing doubles is
order-dependent (Spark's shuffle order ≠ any oracle's scan order), so
a rounded double aggregate can split at a .005 boundary between
engines. Casting to DECIMAL first is lossless for 2dp data and makes
every sum exact and engine-independent; the final CAST(… AS DOUBLE)
of an exact decimal is deterministic on both sides.

SQL twin pattern: ``CAST(SUM(CAST(x AS DECIMAL(12,2)) * (1 -
CAST(d AS DECIMAL(5,2)))) AS DOUBLE)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(12,2)"  # prices: < 10^10, 2dp
RATE = "decimal(5,2)"  # discount / tax rates in [0, 1)


def money(col) -> Column:
    return F.col(col).cast(MONEY) if isinstance(col, str) else col.cast(MONEY)


def rate(col) -> Column:
    return F.col(col).cast(RATE) if isinstance(col, str) else col.cast(RATE)


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact."""
    return money("l_extendedprice") * (F.lit(1).cast(RATE) - rate("l_discount"))


def charge() -> Column:
    """l_extendedprice * (1 - l_discount) * (1 + l_tax), exact."""
    return disc_price() * (F.lit(1).cast(RATE) + rate("l_tax"))


def dsum(expr: Column, alias: str) -> Column:
    """Exact decimal sum surfaced as a deterministic double."""
    return F.sum(expr).cast("double").alias(alias)


def davg(expr: Column, alias: str) -> Column:
    """Exact-sum / count → deterministic double average."""
    return (F.sum(expr).cast("double") / F.count(F.lit(1))).alias(alias)
