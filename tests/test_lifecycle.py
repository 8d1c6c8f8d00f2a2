"""Query lifecycle: golden values, states, timeout clamp, cancel, row cap —
mirrors reference tests/test_executor.py (metrics, state machine, clamps)."""

import uuid

import pytest

from iceberg_explorer_spark.errors import QueryNotFoundError
from iceberg_explorer_spark.lifecycle.executor import QueryExecutor
from iceberg_explorer_spark.lifecycle.models import QueryStatus


@pytest.fixture()
def executor(spark):
    return QueryExecutor(spark)


def test_golden_count_sum(executor):
    # reference golden values: SELECT COUNT(*), SUM(i) FROM range(10) → (10, 45)
    res = executor.execute("SELECT COUNT(*) AS c, SUM(id) AS s FROM range(10)")
    assert res.status == QueryStatus.COMPLETED
    rows = res.batches[0].to_pylist()
    assert rows[0]["c"] == 10 and rows[0]["s"] == 45
    assert res.metrics.rows_returned == 1
    assert res.metrics.duration_seconds is not None


def test_cte_rowcount(executor):
    # reference: CTE SELECT i*2 over range(5) → 5 rows
    res = executor.execute(
        "WITH t AS (SELECT id * 2 AS x FROM range(5)) SELECT x FROM t"
    )
    assert res.total_rows == 5


def test_timeout_clamping(executor):
    assert executor.clamp_timeout(None) == 300.0
    assert executor.clamp_timeout(1) == 10.0
    assert executor.clamp_timeout(99999) == 3600.0
    assert executor.clamp_timeout(60) == 60.0


def test_max_rows_enforced(executor):
    res = executor.execute("SELECT id FROM range(100000)", max_rows=50)
    assert res.total_rows == 50
    assert res.metrics.truncated is True


def test_failed_query_state(executor):
    with pytest.raises(RuntimeError):
        executor.execute("SELECT * FROM table_that_does_not_exist_xyz")
    # the registry keeps the FAILED record
    failed = [
        executor.get_status(qid)
        for qid in list(executor._registry)
        if executor.get_status(qid).status == QueryStatus.FAILED
    ]
    assert failed, "failed query should remain in registry"


def test_status_and_cleanup(executor):
    res = executor.execute("SELECT 1 AS one")
    assert executor.get_status(res.query_id).status == QueryStatus.COMPLETED
    executor.cleanup(res.query_id)
    with pytest.raises(QueryNotFoundError):
        executor.get_status(res.query_id)


def test_cancel_unknown_query(executor):
    assert executor.cancel(uuid.uuid4()) is False


def test_cancel_completed_is_noop(executor):
    res = executor.execute("SELECT 1 AS one")
    assert executor.cancel(res.query_id) is False
    assert executor.get_status(res.query_id).status == QueryStatus.COMPLETED


def test_rows_scanned_populated_and_post_pruning(spark, executor, tmp_path):
    """rows_scanned comes from the executed plan's scan metrics — the field
    the reference declares but never sets. The metric is post-pruning: over
    a partitioned layout, a partition-column predicate must show the scan
    producing only the surviving partition's rows, not the table's."""
    from iceberg_explorer_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    orders = load_table(spark, SF_DIR, "orders")
    out = str(tmp_path / "orders_by_status")
    orders.write.partitionBy("o_orderstatus").parquet(out)
    part = spark.read.parquet(out)
    part.createOrReplaceTempView("orders_part")
    total = part.count()
    in_f = part.filter("o_orderstatus = 'F'").count()
    assert 0 < in_f < total

    res = executor.execute(
        "SELECT o_orderkey FROM orders_part WHERE o_orderstatus = 'F'",
        max_rows=total,
    )
    assert res.metrics.rows_scanned == in_f  # pruned partitions never scanned
    assert res.metrics.rows_returned == in_f


def test_introspection_queries_execute(spark, executor):
    """EXPLAIN/DESCRIBE/SHOW run end-to-end through the executor and return
    rows (reference tests/test_executor.py:437-453 parity)."""
    from iceberg_explorer_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    load_table(spark, SF_DIR, "nation").createOrReplaceTempView("nation_introspect")
    for sql in (
        "EXPLAIN SELECT n_name FROM nation_introspect WHERE n_nationkey > 3",
        "DESCRIBE TABLE nation_introspect",
        "SHOW TABLES",
    ):
        res = executor.execute(sql)
        assert res.status.name == "COMPLETED", sql
        assert res.metrics.rows_returned > 0, sql
    plan_text = executor.execute(
        "EXPLAIN SELECT n_name FROM nation_introspect WHERE n_nationkey > 3"
    )
    text = "\n".join(str(b.to_pydict()) for b in plan_text.batches)
    assert "Physical Plan" in text
