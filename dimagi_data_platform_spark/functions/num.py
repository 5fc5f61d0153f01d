"""Deterministic numeric aggregation helpers.

Floating-point sums depend on accumulation order, which differs between
Spark (partition-parallel) and any single-threaded oracle. To make the
correctness gate bitwise-stable we accumulate money/measure sums in
``DECIMAL(38,10)`` (exact, order-independent) and cast the final value
back to ``double``. The matching DuckDB SQL uses the identical
CAST(... AS DECIMAL(38,10)) → SUM → CAST(... AS DOUBLE) shape, so both
engines produce the same IEEE-754 double.

Per-row double arithmetic (e.g. ``price * (1 - discount)``) is itself
IEEE-deterministic given identical operands, so computing the product in
double and then casting the product to decimal is safe on both sides.

Scale note: decimal aggregation is marginally slower than double but is
exact, overflow-checked, and still whole-stage-codegen'd; at 100 TB the
cost is dominated by shuffle/scan, not the accumulator type.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,10)"


def dsum(col: Column | str) -> Column:
    """Order-independent SUM(col) returned as double.

    The exact decimal sum is rounded to 2 dp before the double cast so
    the unscaled value stays < 2^53: then BOTH Spark's BigDecimal cast
    and DuckDB's unscaled/10^scale division are exactly rounded and
    agree bitwise. (At scale 10 DuckDB double-rounds: double(unscaled)
    loses bits above 2^53 before the division.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)), 2).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent AVG(col): exact rounded sum / count, divided
    in double — one IEEE op on identical operands on both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c) / F.count(c)


def sql_dsum(expr: str) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(38,10))), 2) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return f"{sql_dsum(expr)} / COUNT({expr})"
