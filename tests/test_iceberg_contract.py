"""Offline contract tests for the Iceberg catalog paths (A12/A22 residual).

This container has no network and no iceberg-spark-runtime jar (documented
in README — tests/test_iceberg_roundtrip.py skips), so the Iceberg-backed
catalog code cannot execute end-to-end here. These tests pin the NEXT best
thing: the exact SQL the service issues against Iceberg's metadata tables
and the row→model parsing, against recorded fixtures whose shapes follow
Iceberg's published metadata-table schemas (``<table>.snapshots``:
snapshot_id BIGINT / committed_at TIMESTAMP / operation STRING;
``<table>.files``: readable_metrics.<col>.{null_value_count, lower_bound,
upper_bound}) — the same surface the reference reads via DuckDB's
iceberg_snapshots() (reference api/routes/ui.py:249-271) and never reads
for stats (api/routes/catalog.py:262 hardcodes {}).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from iceberg_explorer_spark.catalog.metadata import CatalogService

# recorded from an iceberg-spark-runtime session: two commits on a table
# (append, overwrite), committed_at returned as TIMESTAMP
SNAPSHOT_FIXTURE = [
    Row(
        snapshot_id=8639312913153309548,
        committed_at=dt.datetime(2026, 1, 5, 10, 0, 1, 250000),
        operation="append",
    ),
    Row(
        snapshot_id=527713811620606627,
        committed_at=dt.datetime(2026, 1, 5, 10, 7, 44, 500000),
        operation="overwrite",
    ),
]

# recorded .files readable_metrics aggregate for a 2-column table
FILES_FIXTURE = [
    Row(n_0=0, lo_0=1, hi_0=25, n_1=3, lo_1="ALGERIA", hi_1="VIETNAM")
]


class FakeDF:
    def __init__(self, rows):
        self._rows = rows

    def collect(self):
        return self._rows


class FakeSchemaField:
    def __init__(self, name):
        self.name = name


class FakeTable:
    def __init__(self, cols):
        self.schema = type(
            "S", (), {"fields": [FakeSchemaField(c) for c in cols]}
        )()


class FakeSpark:
    """Records every SQL statement; serves the recorded fixtures."""

    def __init__(self):
        self.statements: list[str] = []

    def sql(self, q: str) -> FakeDF:
        self.statements.append(q)
        if ".snapshots" in q:
            return FakeDF(SNAPSHOT_FIXTURE)
        if ".files" in q:
            return FakeDF(FILES_FIXTURE)
        if q.startswith("DESCRIBE TABLE EXTENDED"):
            return FakeDF(
                [
                    Row(col_name="Location", data_type="file:/wh/db/nation", comment=""),
                    Row(col_name="Provider", data_type="iceberg", comment=""),
                ]
            )
        if q.startswith("DESCRIBE TABLE"):
            return FakeDF([])
        raise AssertionError(f"unexpected SQL: {q}")

    def table(self, ident: str) -> FakeTable:
        return FakeTable(["n_nationkey", "n_name"])


def _iceberg_service() -> tuple[CatalogService, FakeSpark]:
    fake = FakeSpark()
    svc = CatalogService.__new__(CatalogService)
    svc.spark = fake
    svc.catalog = "ice"
    svc._iceberg = True  # what iceberg_available() returns with the jar
    return svc, fake


def test_snapshots_sql_shape_and_parsing():
    svc, fake = _iceberg_service()
    snaps = svc.snapshots(["db"], "nation")
    sql = fake.statements[-1]
    # the exact metadata-table read: projected columns, time-ordered
    assert "SELECT snapshot_id, committed_at, operation" in sql
    assert "`ice`.`db`.`nation`.snapshots" in sql
    assert "ORDER BY committed_at" in sql
    assert [s.snapshot_id for s in snaps] == [
        8639312913153309548,
        527713811620606627,
    ]
    assert snaps[0].operation == "append"
    # committed_at TIMESTAMP → epoch millis
    expect_ms = int(SNAPSHOT_FIXTURE[0].committed_at.timestamp() * 1000)
    assert snaps[0].timestamp_ms == expect_ms


def test_table_details_carries_current_snapshot():
    svc, fake = _iceberg_service()
    details = svc.table_details(["db"], "nation")
    assert details.format == "ICEBERG"
    assert details.location == "file:/wh/db/nation"
    assert [s.snapshot_id for s in details.snapshots] == [
        8639312913153309548,
        527713811620606627,
    ]
    # newest snapshot is current (time-ordered history)
    assert details.current_snapshot_id == 527713811620606627


def test_files_stats_sql_shape_and_parsing():
    svc, fake = _iceberg_service()
    stats = svc._iceberg_column_stats(["db"], "nation")
    sql = fake.statements[-1]
    assert "FROM `ice`.`db`.`nation`.files" in sql
    # readable_metrics aggregation per column: nulls summed, bounds min/maxed
    assert "readable_metrics.`n_nationkey`.null_value_count" in sql
    assert "readable_metrics.`n_name`.upper_bound" in sql
    by_col = {s.column: s for s in stats}
    assert by_col["n_nationkey"].null_count == 0
    assert by_col["n_nationkey"].min_value == 1
    assert by_col["n_name"].null_count == 3
    assert by_col["n_name"].max_value == "VIETNAM"


def test_non_iceberg_session_never_touches_metadata_tables():
    svc, fake = _iceberg_service()
    svc._iceberg = False
    assert svc.snapshots(["db"], "nation") == []
    assert fake.statements == []
