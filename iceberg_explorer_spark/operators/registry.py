"""Query registry: name → (Spark builder, DuckDB oracle SQL).

Every operator the engine claims is registered here with
  - a builder ``fn(spark, sf_dir) -> DataFrame`` (the Spark-first
    implementation — DataFrame/SQL API, Catalyst-optimized), and
  - an equivalent ANSI-ish SQL string the DuckDB oracle can run on the same
    parquet tables (``None`` for genuinely non-SQL-expressible operators,
    which get a weaker rows-only check).

Determinism contract (so order-insensitive value hashes match across engines):
  * money/double aggregates go through exact DECIMAL arithmetic internally —
    float sums are order-dependent across partitions, decimals are exact;
  * the FINAL value of every money column is surfaced as DOUBLE, never
    DECIMAL: result-materialization paths disagree on decimal rendering
    (``Decimal('139345.00')`` object vs float64 ``139345.0``), while both
    engines correctly round the identical exact decimal to the bit-identical
    IEEE double (functions/deterministic.sum_money). No query output column
    may have DecimalType — enforced by
    tests/test_differential.py::test_no_decimal_output_columns;
  * every aggregate/computed column is aliased identically on both sides;
  * DuckDB's SUM(INTEGER)→HUGEINT widening is cast back to BIGINT to match
    Spark's arrow schema;
  * timestamps are surfaced as DATE or epoch integers, never raw timestamps;
  * rank() (never row_number) over non-unique orderings, or a total-order
    tie-break column, so result membership is deterministic.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: Optional[str] = None, doc: str = ""):
    """Decorator registering a query builder with its oracle SQL.

    The decorated function's ``__name__`` must equal the registration
    name: a helper pasted between ``@query(...)`` and the operator's
    ``def`` silently registers the HELPER as the builder (wrong schema /
    row count, surfacing only at oracle-compare time — this paste trap
    fired three times before this guard). The mismatch now raises at
    import time instead."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if getattr(fn, "__name__", name) != name:
            raise ValueError(
                f"@query({name!r}) decorates a function named "
                f"{fn.__name__!r} — a helper pasted into the decorator "
                "gap would register under the operator's name; name the "
                "builder after its registration"
            )
        QUERIES[name] = QuerySpec(name=name, builder=fn, oracle=oracle, doc=doc)
        return fn

    return deco
