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


def avg_exact(col, scale: int = 2) -> Column:
    """Order-independent average: exact decimal sum → double division.

    Both engines convert the identical exact decimal to the nearest IEEE
    double and divide by the identical count — bit-identical results.
    """
    return F.sum(dec(col, scale)).cast("double") / F.count(
        F.col(col) if isinstance(col, str) else col
    )
