"""Numeric discipline for DuckDB-oracle parity (driver contract, __spark_entry__.py).

The driver hash-compares cell values between our Spark result and DuckDB running the
oracle SQL. Floating-point aggregation is order-dependent, and Spark/DuckDB will not
add doubles in the same order — so every compared aggregate follows one rule:

    aggregate EXACTLY in decimal  →  ROUND to a fixed scale  →  CAST to DOUBLE

Decimal sums are associative/commutative (exact), so both engines produce the identical
decimal; ROUND of an exact decimal is deterministic (both round half away from zero for
positive values); the final DOUBLE is then bit-identical. Averages divide the exact
decimal sum (as double) by the exact count and round — a single double division is
deterministic on both engines.

The matching SQL idioms (used in oracle_sql()):
    SUM:  CAST(ROUND(SUM(CAST(x AS DECIMAL(18,2))), 2) AS DOUBLE)
    AVG:  ROUND(CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

MONEY = "decimal(18,2)"


def money(col: Column | str) -> Column:
    """Cast to exact money decimal before aggregation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def sum_money(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Order-independent SUM: exact decimal sum → round → double."""
    return F.round(F.sum(money(col)), scale).cast("double").alias(alias)


def avg_exact(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent AVG: exact decimal sum / count, one double division, rounded."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast(MONEY)).cast("double") / F.count(F.lit(1)), scale
    ).alias(alias)


def count_big(alias: str) -> Column:
    """COUNT(*) as bigint on both engines."""
    return F.count(F.lit(1)).cast("long").alias(alias)
