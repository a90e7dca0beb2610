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

#: 10^6 — one unit at DEC's scale. The aggregation fast path sums the
#: UNSCALED integer (micros) as a plain long instead of carrying a
#: wide-decimal sum buffer: the per-row value ``cast(c AS DEC)`` is an
#: exact 6-decimal number, so ``cast(c AS DEC) * 1e6`` is an exact
#: integer, longs sum it associatively (order-independent, same as
#: decimal), and one decimal division per GROUP rescales exactly.
#: Spark's decimal Sum keeps a decimal(28,6) buffer and pays a
#: BigDecimal-path add per row — measured 2.3x slower than the long
#: sum for the same result. Headroom note: the long sum overflows at
#: |sum| > 9.2e12 units (vs ~1e22 for the (28,6) buffer); both need a
#: wider discipline for quadrillion-unit money sums, which no registry
#: aggregate approaches even at 100 TB group cardinalities because
#: every dsum/davg call sites groups to bounded domains.
_DEC_UNIT = 1_000_000


def _unscaled(c: Column) -> Column:
    """Exact unscaled-micros long of ``cast(c AS DEC)``."""
    return (c.cast(DEC) * _DEC_UNIT).cast("bigint")


def _rescale(sum_micros: Column) -> Column:
    """Exact decimal rescale of a summed micros long back to units,
    as a double — bit-identical to ``sum(cast(c AS DEC)).cast(double)``
    (same exact rational value, same BigDecimal->double conversion)."""
    return (sum_micros.cast("decimal(38,6)") / _DEC_UNIT).cast("double")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent sum of a double column, rounded to ``scale``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(_rescale(F.sum(_unscaled(c))), scale)


def davg(col: Column | str, scale: int = 4) -> Column:
    """Order-independent average (decimal sum / count), rounded."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(_rescale(F.sum(_unscaled(c))) / F.count(c), scale)


def sql_dsum(expr: str, scale: int = 2) -> str:
    """Oracle-side rendering of :func:`dsum` (DuckDB syntax = ANSI)."""
    return f"round(CAST(sum(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE), {scale})"


def sql_davg(expr: str, scale: int = 4) -> str:
    return (
        f"round(CAST(sum(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / count({expr}), {scale})"
    )
