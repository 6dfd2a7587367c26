"""Cross-engine determinism helpers (SURVEY.md §4.3 item 4).

The driver hashes query output against a DuckDB oracle, so every declared
query must produce *bit-identical* values on both engines. Floating-point
aggregation is order-dependent (Spark merges partial aggregates in
nondeterministic order across partitions), so the rules are:

1. Money/measure columns in the fixtures are exact 2-or-4-decimal values
   (verified in FIXTURES.md/this repo's survey): cast to DECIMAL before
   SUM/AVG → exact arithmetic, identical on both engines, then cast the
   final aggregate back to DOUBLE for a clean output schema.
2. Scalar double math (no aggregation) is IEEE-deterministic given identical
   inputs — allowed freely.
3. Statistical aggregates (stddev/corr/...) are computed from exact decimal
   power sums (sum, sum of squares, sum of products) rather than the
   engines' streaming implementations, making them deterministic too.
4. Round any residual double to 6 dp on BOTH sides only as a last resort.

These helpers exist so each operator module states intent, not mechanics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide-enough decimal for exact sums at 100 TB row counts: 38 total digits,
# scale matched to the data (money = 2dp, rates = 4dp).
MONEY = "decimal(18,2)"
RATE = "decimal(18,4)"


def dec(col: str | Column, scale: int = 2, precision: int = 18) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def d2d(c: Column) -> Column:
    """Decimal → double via an exact decimal string.

    A direct decimal→double cast is NOT correctly rounded in every engine
    (DuckDB can be 1 ulp off vs Spark's BigDecimal.doubleValue), so hashes
    flap. String→double parsing IS correctly rounded everywhere (strtod /
    Double.parseDouble), so both engines land on the identical double.
    """
    return c.cast("string").cast("double")


def dsum(col: str | Column, scale: int = 2) -> Column:
    """Exact decimal sum, emitted as double (deterministic both engines)."""
    return d2d(F.sum(dec(col, scale)))


def davg(col: str | Column, scale: int = 2) -> Column:
    """Deterministic average: exact decimal sum ÷ exact count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (d2d(F.sum(dec(c, scale))) / F.count(c)).cast("double")


def sql_d2d(expr: str) -> str:
    """DuckDB oracle twin of :func:`d2d`."""
    return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB oracle twin of :func:`dsum`."""
    return sql_d2d(f"SUM(CAST({expr} AS DECIMAL(18,{scale})))")


def sql_davg(expr: str, scale: int = 2) -> str:
    """DuckDB oracle twin of :func:`davg`."""
    return (
        f"CAST({sql_d2d(f'SUM(CAST({expr} AS DECIMAL(18,{scale})))')}"
        f" / COUNT({expr}) AS DOUBLE)"
    )


def r6(c: Column) -> Column:
    """Round a double column to 6 dp (pair with ROUND(x, 6) in the oracle)."""
    return F.round(c, 6)


def as_long(c: Column) -> Column:
    """Normalize integer-ish computed columns to BIGINT on both sides —
    Spark year()/count() etc. return int vs DuckDB's bigint."""
    return c.cast("long")
