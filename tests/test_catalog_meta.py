"""Catalog metadata surface + namespace codec + health — mirrors reference
tests/test_catalog.py (path parsing, schema flags) without a live REST
catalog (temp views + default catalog stand in)."""

import pytest

from iceberg_explorer_spark.catalog.metadata import (
    CatalogService,
    build_namespace_path,
    parse_namespace,
    quote_identifier,
)
from iceberg_explorer_spark.sources.registry import register_tables
from tests.conftest import SF_DIR


def test_namespace_codec():
    assert parse_namespace("a\x1fb\x1fc") == ["a", "b", "c"]
    assert parse_namespace("") == []
    assert build_namespace_path(["accounting", "tax"]) == "accounting\x1ftax"
    assert parse_namespace(build_namespace_path(["x"])) == ["x"]


def test_quote_identifier():
    assert quote_identifier("plain") == "`plain`"
    assert quote_identifier("we`ird") == "`we``ird`"


@pytest.fixture()
def service(spark):
    register_tables(spark, SF_DIR)
    return CatalogService(spark)


def test_list_namespaces(service):
    assert ["default"] in service.list_namespaces()


def test_list_tables_contains_views(service):
    tables = service.list_tables([])
    for t in ("lineitem", "orders", "documents"):
        assert t in tables


def test_table_schema_types(service):
    schema = {f.name: f for f in service.table_schema([], "lineitem")}
    assert schema["l_orderkey"].type == "bigint"
    assert schema["l_quantity"].type == "double"
    assert schema["l_returnflag"].type == "string"
    # parquet naive timestamps surface as TIMESTAMP_NTZ in Spark 4 — the
    # wall-clock-faithful reading (matches what DuckDB sees in the same file)
    assert schema["l_shipdate"].type == "timestamp_ntz"


def test_health(service):
    report = service.health()
    assert report["status"] == "healthy"
    assert report["checks"]["engine"] == "healthy"


def test_column_stats_from_parquet_footers(service, oracle):
    stats = {
        s.column: s
        for s in service.column_stats([], "lineitem", path=f"{SF_DIR}/lineitem.parquet")
    }
    want_min, want_max = oracle.execute(
        "SELECT MIN(l_orderkey), MAX(l_orderkey) FROM lineitem"
    ).fetchone()
    assert stats["l_orderkey"].null_count == 0
    assert stats["l_orderkey"].min_value == want_min
    assert stats["l_orderkey"].max_value == want_max
    qmin, qmax = oracle.execute(
        "SELECT MIN(l_quantity), MAX(l_quantity) FROM lineitem"
    ).fetchone()
    assert stats["l_quantity"].min_value == qmin
    assert stats["l_quantity"].max_value == qmax


def test_column_stats_unresolvable_is_empty(service):
    # bare temp view: no storage location, no Iceberg catalog → []
    assert service.column_stats([], "lineitem") == []
