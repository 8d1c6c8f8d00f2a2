"""Result-registry retention policy (VERDICT r7 item 5).

The executor materializes every result fully on the driver (matching the
reference's behavior) and holds it for slow-streaming clients — so the
registry needs a bound: N large completed results held while N clients
stream slowly must not grow driver memory without limit. The policy:
terminal results are bounded by count AND total Arrow bytes, evicting
fully-streamed results first, then the oldest terminal; in-flight queries
and the just-finished result are never evicted.
"""

from __future__ import annotations

import pytest

from iceberg_explorer_spark.errors import QueryNotFoundError
from iceberg_explorer_spark.lifecycle.executor import QueryExecutor
from iceberg_explorer_spark.lifecycle.models import QueryStatus


def _run_n(ex, n, rows=100):
    return [
        ex.execute(f"SELECT id, id * {i + 1} AS x FROM range({rows})")
        for i in range(n)
    ]


def test_count_bound_evicts_oldest_terminal(spark):
    ex = QueryExecutor(spark, max_retained_results=3)
    results = _run_n(ex, 6)
    retained = [r for r in results if r.query_id in ex._registry]
    assert len(retained) == 3
    # the three NEWEST survive; the three oldest answered with not-found
    assert retained == results[3:]
    for r in results[:3]:
        with pytest.raises(QueryNotFoundError):
            ex.get_status(r.query_id)
    ex.get_status(results[-1].query_id)  # newest still addressable


def test_streamed_complete_evicted_before_unstreamed(spark):
    from iceberg_explorer_spark.service.streaming_results import stream_results

    ex = QueryExecutor(spark, max_retained_results=2)
    a, b, c = _run_n(ex, 3)  # bound already exceeded by c's arrival: a gone
    assert a.query_id not in ex._registry
    # fully stream b — it becomes the preferred eviction candidate even
    # though c is OLDER-retained than the next arrival
    assert b.streamed_complete is False
    list(stream_results(b, page_size=100))
    assert b.streamed_complete is True
    d = ex.execute("SELECT 1 AS one")
    # b (streamed) was evicted in preference to c (unstreamed, older tier 2)
    assert b.query_id not in ex._registry
    assert c.query_id in ex._registry and d.query_id in ex._registry


def test_byte_bound_and_protection_of_newest(spark):
    # a 1-byte budget is over-run by ANY non-empty result: every older
    # terminal result is evicted, but the just-finished one is admitted
    # (protected) rather than rejected
    ex = QueryExecutor(spark, max_retained_bytes=1)
    results = _run_n(ex, 3)
    assert [r for r in results if r.query_id in ex._registry] == [results[-1]]
    assert results[-1].result_nbytes > 1  # genuinely over budget, admitted


def test_evicted_query_returns_404_on_app_routes(spark):
    """End-to-end contract of eviction: after the bound pushes a result
    out, its id answers 404 on the results AND status routes (the same
    shape as the reference's unknown-id path) — the client's cue to
    re-run, never a crash or a stale body."""
    from iceberg_explorer_spark.service.app import ExplorerApp

    ex = QueryExecutor(spark, max_retained_results=1)
    app = ExplorerApp(spark, executor=ex)
    first = app.handle(
        "POST", "/api/v1/query/execute", body={"sql": "SELECT 1 AS a"}
    )
    second = app.handle(
        "POST", "/api/v1/query/execute", body={"sql": "SELECT 2 AS b"}
    )
    assert first.status == 200 and second.status == 200
    evicted_id = first.body["query_id"]
    for route in (f"/api/v1/query/{evicted_id}/results",
                  f"/api/v1/query/{evicted_id}/status"):
        resp = app.handle("GET", route, params={"page_size": 100})
        assert resp.status == 404, route
        assert "not found" in resp.body["detail"].lower()
    # the retained (newest) result still streams fine
    ok = app.handle(
        "GET",
        f"/api/v1/query/{second.body['query_id']}/results",
        params={"page_size": 100},
    )
    assert ok.status == 200


def test_retention_gauges_track_registry(spark):
    """A21 tie-in: the retention policy publishes its state — terminal
    results held, their Arrow bytes, and cumulative evictions — through
    the same recorder as the reference's three instruments."""
    from iceberg_explorer_spark.observability import QueryObserver

    obs = QueryObserver()
    ex = QueryExecutor(spark, max_retained_results=2, observer=obs)
    results = _run_n(ex, 4)
    rec = obs.recorder
    retained = [r for r in results if r.query_id in ex._registry]
    assert rec.retained_results == len(retained) == 2
    assert rec.retained_result_bytes == sum(r.result_nbytes for r in retained)
    assert rec.results_evicted == 2  # four ran, two survive
    assert rec.retained_result_bytes > 0


def test_partial_stream_does_not_mark_complete(spark):
    from iceberg_explorer_spark.service.streaming_results import stream_results

    ex = QueryExecutor(spark)
    r = ex.execute("SELECT id FROM range(250) ORDER BY id")
    list(stream_results(r, page_size=100, offset=0))
    assert r.rows_streamed_hwm == 100 and not r.streamed_complete
    list(stream_results(r, page_size=100, offset=100))
    assert r.rows_streamed_hwm == 200 and not r.streamed_complete
    # a page past the end without delivering rows is NOT proof of delivery
    list(stream_results(r, page_size=100, offset=400))
    assert not r.streamed_complete
    list(stream_results(r, page_size=100, offset=200))  # the real final page
    assert r.rows_streamed_hwm == 250 and r.streamed_complete


def test_zero_row_result_marks_complete_only_after_stream(spark):
    from iceberg_explorer_spark.service.streaming_results import stream_results

    ex = QueryExecutor(spark)
    r = ex.execute("SELECT id FROM range(10) WHERE id < 0")
    assert r.status == QueryStatus.COMPLETED and r.total_rows == 0
    assert not r.streamed_complete  # nobody has asked yet
    list(stream_results(r, page_size=100))
    assert r.streamed_complete


def test_failed_result_counts_streamed_after_error_message(spark):
    from iceberg_explorer_spark.service.streaming_results import stream_results

    ex = QueryExecutor(spark)
    with pytest.raises(Exception):
        ex.execute("SELECT raise_error('boom') AS boom FROM range(1)")
    failed = [
        r
        for r in ex._registry.values()
        if r.status in (QueryStatus.FAILED,)
    ]
    if not failed:  # gate may reject before execution on some builds
        pytest.skip("statement failed before reaching the executor")
    r = failed[0]
    assert not r.streamed_complete
    msgs = list(stream_results(r, page_size=100))
    assert '"error"' in msgs[0]
    assert r.streamed_complete


def test_jump_to_last_page_does_not_mark_complete(spark):
    """A client fetching ONLY the tail page (jump-to-last-page UI, or a
    resumed client that never read the earlier pages) must not promote
    the result into the evict-first tier: delivery is complete only when
    the CONTIGUOUS prefix covers every row — evicting on a tail fetch
    404s the client when it comes back for rows it never received."""
    from iceberg_explorer_spark.service.streaming_results import stream_results

    ex = QueryExecutor(spark)
    r = ex.execute("SELECT id FROM range(250) ORDER BY id")
    list(stream_results(r, page_size=100, offset=200))  # tail only
    assert r.rows_streamed_hwm == 0 and not r.streamed_complete
    # backfilling the prefix still doesn't count rows 200-249 as part of
    # the contiguous run (they were delivered before the prefix existed)
    list(stream_results(r, page_size=100, offset=0))
    list(stream_results(r, page_size=100, offset=100))
    assert r.rows_streamed_hwm == 200 and not r.streamed_complete
    # re-fetching the tail ON TOP of the contiguous prefix completes it
    list(stream_results(r, page_size=100, offset=200))
    assert r.rows_streamed_hwm == 250 and r.streamed_complete


def test_timed_out_query_never_attaches_result_bytes(spark):
    """cancelJobGroup is cooperative: a timed-out query's worker thread
    often finishes its toArrow anyway. It must NOT attach the table to
    the already-FAILED result — retention ran at timeout with
    result_nbytes == 0, no client can ever stream a FAILED result's
    rows, so attached bytes would be invisible, unreachable driver
    memory."""
    import time as _time

    class _SlowSql:
        """Delegate everything to the real session, but stall sql() past
        the timeout so the worker completes AFTER the executor gave up."""

        def __init__(self, inner, delay):
            self._inner, self._delay = inner, delay

        def __getattr__(self, name):
            return getattr(self._inner, name)

        def sql(self, body):
            _time.sleep(self._delay)
            return self._inner.sql(body)

    ex = QueryExecutor(_SlowSql(spark, 1.0), min_timeout=0.1)
    with pytest.raises(Exception):
        ex.execute("SELECT id FROM range(100)", timeout=0.1)
    r = [q for q in ex._registry.values()][-1]
    assert r.status == QueryStatus.FAILED
    # let the detached worker finish its (successful) toArrow: it
    # stalls 1 s in sql(), then SELECT 1-scale work — 3 s is plenty
    _time.sleep(3.0)
    assert r.result_nbytes == 0 and r.total_rows == 0
    assert r.status == QueryStatus.FAILED
