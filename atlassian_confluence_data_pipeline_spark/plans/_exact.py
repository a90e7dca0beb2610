"""Cross-engine-exact aggregation helpers.

Double-precision sums are order-dependent, and Spark and DuckDB will
reduce partitions in different orders — so a raw ``sum(double)`` can
differ in the last ULP and break the driver's value-hash comparison.
The fix: route every money/quantity sum through DECIMAL (exact,
associative, order-independent), then cast back to DOUBLE and round.
Both engines then produce bit-identical doubles. The same helpers keep
the Spark side and the oracle-SQL side in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: scale 6 represents any product of three 2-decimal factors EXACTLY
#: (fixture doubles are 2-decimal) — no rounding ties; Spark widens sums to (28,6)
DEC = "decimal(18,6)"


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent sum of a double column, rounded to ``scale``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double"), scale)


def davg(col: Column | str, scale: int = 4) -> Column:
    """Order-independent average (decimal sum / count), rounded."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double") / F.count(c), scale)


def sql_dsum(expr: str, scale: int = 2) -> str:
    """Oracle-side rendering of :func:`dsum` (DuckDB syntax = ANSI)."""
    return f"round(CAST(sum(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE), {scale})"


def sql_davg(expr: str, scale: int = 4) -> str:
    return (
        f"round(CAST(sum(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / count({expr}), {scale})"
    )
