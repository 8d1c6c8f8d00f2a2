"""Server-side result post-processing: sort + per-column filter parity with
the reference UI (A16/A17).

The reference implements these CLIENT-side over fetched rows
(reference: src/iceberg_explorer/templates/query.html:629-674 toggleSort/
applySort, :676-715 applyFilters). Re-expressed here as DataFrame operations
so the semantics are server-side, testable without a browser, and scale to
results that never fit a browser tab:

- Sort cycle per column: asc → desc → none (query.html:629-645).
- Sort comparator (query.html:647-674): NULLs compare as LARGEST (last under
  asc, first under desc); numeric columns compare natively; everything else
  compares as a lowercased string (JS localeCompare ≈ codepoint order for the
  ASCII test corpus — documented divergence for exotic locales).
- Filters (query.html:676-715): conjunctive across columns; empty filter
  passes everything; a NULL cell matches only the literal filter ``null``
  (case-insensitive); on numeric columns a filter shaped ``>n <n >=n <=n``
  is a range predicate; anything else is a case-insensitive substring match
  on the cell's string form (so the filter ``null`` ALSO matches non-null
  cells whose text contains "null" — reference behavior, preserved).

At scale: filters are plain Catalyst predicates (pushed into the scan when
applied before materialization); sort is a global orderBy — callers that
only need a page should compose with limit/offset so Spark plans
TakeOrderedAndProject instead of a full sort.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Mapping, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

#: filter text shaped like a numeric range predicate (query.html:690)
_RANGE_RE = re.compile(r"^([<>]=?)\s*(-?\d+\.?\d*)$")


@dataclass(frozen=True)
class SortState:
    """Current sort of a result view: column name + direction or inactive."""

    column: Optional[str] = None
    direction: str = "asc"  # "asc" | "desc"

    def toggled(self, column: str) -> "SortState":
        """The reference's per-column click cycle: asc → desc → none
        (query.html:629-645); clicking a different column starts asc."""
        if self.column == column:
            if self.direction == "asc":
                return SortState(column, "desc")
            return SortState(None, "asc")
        return SortState(column, "asc")


def _is_numeric(df: DataFrame, column: str) -> bool:
    return isinstance(df.schema[column].dataType, NumericType)


def apply_sort(df: DataFrame, state: SortState) -> DataFrame:
    """Order ``df`` per the reference comparator; no-op when inactive."""
    if state.column is None:
        return df
    col = F.col(state.column)
    # non-numeric columns compare as lowercased strings (query.html:666-669);
    # booleans/dates/timestamps take this path too, matching JS String(v)
    key = col if _is_numeric(df, state.column) else F.lower(col.cast("string"))
    # NULL is the largest value: last under asc, first under desc
    ordered = key.asc_nulls_last() if state.direction == "asc" else key.desc_nulls_first()
    return df.orderBy(ordered)


def _column_predicate(df: DataFrame, column: str, text: str) -> Column:
    col = F.col(column)
    wants_null = text.strip().lower() == "null"
    if _is_numeric(df, column):
        m = _RANGE_RE.match(text.strip())
        if m:
            op, num = m.group(1), float(m.group(2))
            cmp = {
                ">": col > num,
                "<": col < num,
                ">=": col >= num,
                "<=": col <= num,
            }[op]
            # NULL cells never satisfy a range filter (query.html:683-685
            # checks null before the range branch); Spark's three-valued
            # logic already drops NULL comparisons, made explicit here.
            return F.when(col.isNull(), F.lit(False)).otherwise(cmp)
    contains = F.lower(col.cast("string")).contains(text.strip().lower())
    return F.when(col.isNull(), F.lit(wants_null)).otherwise(contains)


def apply_filters(df: DataFrame, filters: Mapping[str, str]) -> DataFrame:
    """Conjunctive per-column filters per the reference semantics. Unknown
    column names raise (the UI can only filter visible columns)."""
    pred: Optional[Column] = None
    for column, text in filters.items():
        if column not in df.columns:
            raise KeyError(f"unknown filter column: {column!r}")
        if not text or not text.strip():
            continue
        p = _column_predicate(df, column, text)
        pred = p if pred is None else (pred & p)
    return df.filter(pred) if pred is not None else df


def postprocess(
    df: DataFrame,
    filters: Optional[Mapping[str, str]] = None,
    sort: Optional[SortState] = None,
) -> DataFrame:
    """Filters first, then sort — the reference's applyFilters→applySort
    order (query.html:710-713)."""
    out = apply_filters(df, filters or {})
    return apply_sort(out, sort or SortState())
