"""Cross-engine-deterministic aggregation helpers.

Floating-point sums are order-dependent: Spark sums partials per partition in
shuffle order, a single-node engine sums in scan order, so ``SUM(double)`` of
the same rows can differ in the last bits — enough to break value-hash
comparison and, at 100 TB, enough to make reruns non-reproducible. The fix is
exact DECIMAL arithmetic for money-like columns: cast the double input to a
fixed-scale decimal (the test data carries ≤2 decimal digits, so the cast is
lossless), aggregate exactly, and cast the result back to a fixed type that
both Spark and DuckDB agree on (DuckDB widens SUM(DECIMAL(p,s)) to
DECIMAL(38,s); Spark to DECIMAL(p+10,s) — both are cast to DECIMAL(18,s)).

This costs a few % vs native double sums but is exact, associative, and
scale-invariant: the same plan gives bit-identical answers on 1 executor or
1000.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col, scale: int = 2, precision: int = 18) -> Column:
    """Cast a (double) column to an exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def sum_dec(col, scale: int = 2, out_scale: int | None = None) -> Column:
    """Exact decimal SUM with a fixed output type DECIMAL(18, out_scale)."""
    out = out_scale if out_scale is not None else scale
    return F.sum(dec(col, scale)).cast(f"decimal(18,{out})")


def sum_money(col, scale: int = 2) -> Column:
    """Exact decimal SUM surfaced as DOUBLE.

    The aggregation itself is exact decimal (order-independent across any
    partitioning — see module docstring); only the FINAL value is cast to
    double. Both engines correctly round the identical exact decimal to the
    nearest IEEE double, so the surfaced float64 is bit-identical — and,
    unlike a decimal column, renders identically everywhere (``139345.0``,
    never a trailing-zero ``Decimal('139345.00')`` vs float ``139345.0``
    divergence between result-materialization paths).

    Output-surface contract: query results never expose DECIMAL columns —
    exact decimal is an internal aggregation representation only. Enforced by
    tests/test_differential.py::test_no_decimal_output_columns.
    """
    return F.sum(dec(col, scale)).cast("double")


def money(col) -> Column:
    """Surface a raw money column as DOUBLE (no-op for double inputs)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("double")


def avg_exact(col, scale: int = 2) -> Column:
    """Order-independent average: exact decimal sum → double division.

    Both engines convert the identical exact decimal to the nearest IEEE
    double and divide by the identical count — bit-identical results.
    """
    return F.sum(dec(col, scale)).cast("double") / F.count(
        F.col(col) if isinstance(col, str) else col
    )
