"""NDJSON result-streaming protocol with offset/page_size pagination.

Message order and shapes match the reference exactly (API contract —
reference api/routes/query.py:83-230, models/query.py:56-91):

    {"type": "metadata", "query_id", "columns", "total_rows"}
    {"type": "data", "rows": [[...], ...]}          # ≤ 100 rows per message
    {"type": "progress", "rows_sent", "total_rows"}
    {"type": "complete", "rows_returned", "duration_seconds"}
    {"type": "error", "error"}

page_size ∈ {100, 250, 500, 1000} (reference api/routes/query.py:35,255-259);
offset skips rows across the stored Arrow batches without materializing them
as Python objects (zero-copy batch slicing).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from iceberg_explorer_spark.errors import QueryNotFoundError
from iceberg_explorer_spark.lifecycle.models import QueryResult, QueryStatus
from iceberg_explorer_spark.service.convert import arrow_rows, json_value

VALID_PAGE_SIZES = (100, 250, 500, 1000)
DATA_SUB_BATCH = 100


def validate_page_size(page_size: int) -> None:
    if page_size not in VALID_PAGE_SIZES:
        raise ValueError(
            f"page_size must be one of {VALID_PAGE_SIZES}, got {page_size}"
        )


def stream_results(
    result: QueryResult, page_size: int = 100, offset: int = 0
) -> Iterator[str]:
    """Yield NDJSON lines for one page of a completed query's results."""
    validate_page_size(page_size)
    if offset < 0:
        raise ValueError("offset must be >= 0")

    if result.status == QueryStatus.FAILED:
        result.stream_delivered_final = True  # error message IS the stream
        yield json.dumps({"type": "error", "error": result.error or "query failed"})
        return
    if result.status == QueryStatus.CANCELLED:
        result.stream_delivered_final = True
        yield json.dumps({"type": "error", "error": "query was cancelled"})
        return
    if result.status != QueryStatus.COMPLETED:
        raise QueryNotFoundError("query has no results yet")

    total = result.total_rows
    yield json.dumps(
        {
            "type": "metadata",
            "query_id": str(result.query_id),
            "columns": result.column_names(),
            "total_rows": total,
        }
    )

    remaining = page_size
    to_skip = offset
    sent = 0
    for batch in result.batches:
        if remaining <= 0:
            break
        if to_skip >= batch.num_rows:
            to_skip -= batch.num_rows
            continue
        window = batch.slice(to_skip, min(remaining, batch.num_rows - to_skip))
        to_skip = 0
        # ≤100-row data messages (reference api/routes/query.py:164-219)
        for start in range(0, window.num_rows, DATA_SUB_BATCH):
            sub = window.slice(start, min(DATA_SUB_BATCH, window.num_rows - start))
            rows = [
                [json_value(v) for v in row] for row in arrow_rows(sub)
            ]
            yield json.dumps({"type": "data", "rows": rows})
            sent += sub.num_rows
            yield json.dumps(
                {"type": "progress", "rows_sent": sent, "total_rows": total}
            )
        remaining -= window.num_rows

    # Retention bookkeeping for the executor's eviction policy (marked
    # BEFORE the complete yield so a consumer that stops at the complete
    # message still counts). rows_streamed_hwm is a CONTIGUOUS-prefix
    # high-water mark: a page only advances it when it starts at or
    # before the rows already delivered (offset <= hwm) — a
    # jump-to-last-page fetch (offset=200 of 250 with nothing before it)
    # proves nothing about rows 0-199, and promoting such a result into
    # the evict-first tier would 404 the client when it comes back for
    # the pages it never received. Empty pages (offset past the end)
    # advance nothing for the same reason. `stream_delivered_final` then
    # means exactly "some client has been delivered EVERY row as a
    # contiguous prefix" (or the 0-row result was fetched at all).
    if sent > 0 and offset <= result.rows_streamed_hwm:
        result.rows_streamed_hwm = max(result.rows_streamed_hwm, offset + sent)
    if result.rows_streamed_hwm >= total and (
        total > 0 or (offset == 0 and total == 0)
    ):
        result.stream_delivered_final = True
    yield json.dumps(
        {
            "type": "complete",
            "rows_returned": sent,
            "duration_seconds": result.metrics.duration_seconds,
        }
    )
