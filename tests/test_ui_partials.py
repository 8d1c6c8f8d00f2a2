"""A14 UI partials: the reference's HTMX fragment contract
(reference api/routes/ui.py:53-315) rendered framework-free over the Spark
catalog. Pins the view-model behaviors, not the styling: stable md5 ids,
URL-encoded \\x1f namespace paths, last-dot table-path split, error
partials for malformed paths, escaped identifiers."""

from __future__ import annotations

import hashlib

import pytest

from iceberg_explorer_spark.catalog.metadata import CatalogService
from iceberg_explorer_spark.service import ui_partials as ui
from iceberg_explorer_spark.sources.registry import register_tables
from tests.conftest import SF_DIR


@pytest.fixture()
def svc(spark):
    register_tables(spark, SF_DIR)
    return CatalogService(spark)


def test_encode_and_id_match_reference_scheme():
    parts = ["accounting", "tax"]
    assert ui.encode_namespace(parts) == "accounting%1Ftax"
    expect = hashlib.md5("accounting\x1ftax".encode()).hexdigest()[:8]
    assert ui.generate_id(parts) == expect


def test_namespace_tree_lists_default(svc):
    html = ui.namespace_tree_partial(svc)
    assert 'class="namespace-tree"' in html
    assert ">default<" in html
    eid = ui.generate_id(["default"])
    assert f'id="children-{eid}"' in html
    assert f"namespace-children?parent=default" in html


def test_children_empty_parent_is_empty_not_error(svc):
    html = ui.namespace_children_partial(svc, "")
    assert "empty" in html and "error" not in html


def test_children_of_default_lists_tables(svc):
    html = ui.namespace_children_partial(svc, "default")
    # the registered temp views live in the session, not the default db;
    # at minimum the partial renders without error and is well-formed
    assert html.startswith('<div class="namespace-children')


def test_table_details_error_branches(svc):
    assert "Invalid table path format" in ui.table_details_partial(svc, "nodots")
    assert "Invalid namespace" in ui.table_details_partial(svc, ".orders")
    assert "Invalid table name" in ui.table_details_partial(svc, "default.")
    # unknown table → graceful error partial, not an exception
    assert "error" in ui.table_details_partial(svc, "default.no_such_table")


def test_table_details_renders_schema(spark, svc):
    spark.sql("CREATE DATABASE IF NOT EXISTS uipart")
    spark.sql("DROP TABLE IF EXISTS uipart.t1")
    try:
        spark.sql(
            "CREATE TABLE uipart.t1 (id BIGINT NOT NULL, name STRING) "
            "USING parquet PARTITIONED BY (dt STRING)"
        )
        html = ui.table_details_partial(svc, "uipart.t1")
        assert "uipart.t1" in html
        # parquet-backed tables surface all columns nullable on read-back
        assert "<td>id</td><td>bigint</td><td>nullable</td>" in html
        assert "<td>name</td><td>string</td><td>nullable</td>" in html
        assert "<td>dt</td><td>string</td><td>nullable</td><td>partition</td>" in html
        assert 'class="partitions">dt<' in html
        assert "format=PARQUET" in html
    finally:
        spark.sql("DROP TABLE IF EXISTS uipart.t1")
        spark.sql("DROP DATABASE IF EXISTS uipart")


def test_identifiers_are_escaped():
    item = ui._table_item(["db"], "evil<script>")
    assert "<script>" not in item
    assert "evil&lt;script&gt;" in item


def test_nested_namespace_table_path_round_trips():
    """The table-details link for a nested namespace must survive ONE URL
    decode (the framework's) and parse back to the original namespace. A
    second quote() over the already-encoded namespace half used to
    double-encode '%' (a\\x1fb -> a%251Fb) and break every nested link."""
    from urllib.parse import unquote

    from iceberg_explorer_spark.catalog.metadata import parse_namespace

    item = ui._table_item(["warehouse", "raw"], "orders")
    # the hx-get param carries the once-encoded path, not a double-encoded one
    assert "table_path=warehouse%1Fraw.orders" in item
    assert "%25" not in item
    # simulate the framework's single decode, then the last-dot split
    decoded = unquote("warehouse%1Fraw.orders")
    last_dot = decoded.rfind(".")
    assert parse_namespace(decoded[:last_dot]) == ["warehouse", "raw"]
    assert decoded[last_dot + 1 :] == "orders"
