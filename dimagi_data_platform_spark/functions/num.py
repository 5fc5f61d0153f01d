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


def qsum(col: Column | str, digits: int = 1) -> Column:
    """Order-independent sum of QUANTIZED values, for full-mantissa
    doubles (e.g. products x*y feeding moment statistics).

    ``dsum`` is only bitwise-portable when the double's shortest decimal
    repr equals its exact decimal value (true for 2-dp money, false for
    arbitrary products: Spark's double→decimal cast takes the shortest
    repr, DuckDB expands the exact binary value, and they disagree past
    ~17 significant digits). Here we floor(value * 10^digits) first —
    multiply and floor are single IEEE ops, and the result is an
    integral double (keep |value|*10^digits < 2^53) that BOTH engines
    cast to decimal exactly — then sum exactly and divide once.
    """
    c = F.col(col) if isinstance(col, str) else col
    factor = float(10**digits)
    f = F.floor(c * F.lit(factor)).cast("decimal(38,0)")
    return F.sum(f).cast("double") / F.lit(factor)


def sql_qsum(expr: str, digits: int = 1) -> str:
    """DuckDB-side twin of :func:`qsum`."""
    factor = float(10**digits)
    return (
        f"CAST(SUM(CAST(floor(({expr}) * {factor}) AS DECIMAL(38,0))) AS DOUBLE)"
        f" / {factor}"
    )


def sql_dsum(expr: str) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(38,10))), 2) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return f"{sql_dsum(expr)} / COUNT({expr})"


def int_to_double(col: Column) -> Column:
    """Deterministic DOUBLE of an exact integer-valued DECIMAL column,
    portable across engines. Needed past 2^53: the JVM's
    Decimal→double rounds to nearest, but DuckDB's HUGEINT/DECIMAL →
    DOUBLE casts TRUNCATE, so the two engines disagree by one ulp on
    large moment sums. Split |x| = hi2·2^64 + hi·2^32 + lo (each limb
    < 2^53 for |x| < 2^117, so each converts exactly), rebuild with
    exact power-of-two scales and two fixed-order adds — every step is
    the same IEEE op on both engines. Correctly rounded through 2^85
    (hi2 = 0 there, identical to the two-limb split); beyond that,
    deterministic to the fixed association (what the parity gate
    needs). Pair with :func:`sql_int_to_double`.
    """
    from decimal import Decimal

    m32 = 4294967296
    m64 = F.lit(Decimal(18446744073709551616))
    a = F.abs(col)
    hi2 = ((a - (a % m64)) / m64).cast("decimal(38,0)").cast("double")
    rem = (a % m64).cast("decimal(38,0)")
    hi = ((rem - (rem % F.lit(m32))) / F.lit(m32)).cast("decimal(38,0)").cast(
        "double"
    )
    lo = (rem % F.lit(m32)).cast("double")
    sign = F.when(col < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    return sign * (
        (hi2 * F.lit(18446744073709551616.0) + hi * F.lit(4294967296.0)) + lo
    )


def sql_int_to_double(expr: str) -> str:
    """DuckDB twin of :func:`int_to_double` for HUGEINT/BIGINT exprs
    (`//` is DuckDB's integer division; exact on each limb)."""
    a = f"ABS({expr})"
    # NB: wrapped in ONE outer paren pair — callers interpolate this
    # into larger expressions (including as a DIVISOR), where a bare
    # sign*limbs product would regroup under left-associativity
    return (
        f"((CASE WHEN ({expr}) < 0 THEN -1.0 ELSE 1.0 END)"
        f" * ((CAST({a} // 18446744073709551616 AS DOUBLE)"
        f" * 18446744073709551616.0"
        f" + CAST(({a} % 18446744073709551616) // 4294967296 AS DOUBLE)"
        f" * 4294967296.0)"
        f" + CAST({a} % 4294967296 AS DOUBLE)))"
    )
