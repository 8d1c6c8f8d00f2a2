"""Catalog-browser UI partials (A14) — framework-free HTML fragments.

The reference serves three HTMX partials (reference api/routes/ui.py:53-315
+ templates/partials/*.html): the namespace tree, a namespace's children
(child namespaces + tables), and a table-details panel. This module
re-implements that contract over the Spark catalog without FastAPI/Jinja:
each endpoint is a pure function (catalog service, params) → HTML string,
so any web framework — or a test — can serve it directly.

Contract parity pinned here (tests/test_ui_partials.py):
  * namespace identity: ``\\x1f``-joined path, URL-encoded for hx-get
    params, md5[:8] stable element ids (reference ui.py:30-38);
  * children of an empty parent render the empty state, never an error
    (reference ui.py:105-111);
  * table paths are ``<encoded-namespace>.<table>`` with the LAST dot as
    the namespace/table split (reference ui.py:183-195), and malformed
    paths produce the error partial, never an exception;
  * details carry column name/type/nullable/is-partition flags, the sorted
    partition-column list, snapshot history, and the current snapshot
    (reference ui.py:284-306);
  * every catalog-sourced string is HTML-escaped.
"""

from __future__ import annotations

import hashlib
from html import escape
from urllib.parse import quote

from iceberg_explorer_spark.catalog.metadata import (
    NS_SEPARATOR,
    CatalogService,
    parse_namespace,
)


def encode_namespace(parts: list[str]) -> str:
    """URL-encode the \\x1f-joined namespace (reference ui.py:30-33)."""
    return quote(NS_SEPARATOR.join(parts), safe="")


def generate_id(parts: list[str]) -> str:
    """Stable 8-hex element id for a namespace/table path (ui.py:35-38)."""
    path = NS_SEPARATOR.join(parts)
    return hashlib.md5(path.encode(), usedforsecurity=False).hexdigest()[:8]


def _ns_item(parts: list[str]) -> str:
    name, eid = escape(parts[-1]), generate_id(parts)
    enc = escape(encode_namespace(parts), quote=True)
    return (
        f'<div class="namespace-item" data-ns-id="{eid}">'
        f'<button hx-get="/ui/partials/namespace-children?parent={enc}" '
        f'hx-target="#children-{eid}" hx-trigger="click once" '
        f'hx-swap="innerHTML">{name}</button>'
        f'<div id="children-{eid}" class="namespace-children"></div>'
        f"</div>"
    )


def _table_item(namespace: list[str], table: str) -> str:
    eid = generate_id([*namespace, table])
    # The namespace half is already URL-encoded by encode_namespace — a
    # second quote() would double-encode '%' (a\x1fb -> a%251Fb) and break
    # table-details links for every nested namespace after the framework's
    # single decode. The reference (ui.py:148) interpolates the once-encoded
    # path directly; we only HTML-escape it for the attribute.
    table_path = f"{encode_namespace(namespace)}.{table}"
    enc = escape(table_path, quote=True)
    return (
        f'<div class="table-item" data-table-id="{eid}">'
        f'<button hx-get="/ui/partials/table-details?table_path={enc}" '
        f'hx-target="#table-details" hx-swap="innerHTML">'
        f"{escape(table)}</button></div>"
    )


def namespace_tree_partial(svc: CatalogService) -> str:
    """Top-level namespace tree (reference ui.py:53-88). Catalog failures
    degrade to the empty state — the browser shell must always render."""
    try:
        namespaces = svc.list_namespaces()
    except Exception:
        namespaces = []
    if not namespaces:
        return '<div class="namespace-tree empty">No namespaces found</div>'
    items = "".join(_ns_item(parts) for parts in namespaces)
    return f'<div class="namespace-tree">{items}</div>'


def namespace_children_partial(svc: CatalogService, parent: str) -> str:
    """Children (sub-namespaces + tables) of an encoded parent path
    (reference ui.py:91-167). Empty parent → empty partial, not an error."""
    parent_parts = parse_namespace(parent)
    namespaces: list[list[str]] = []
    tables: list[str] = []
    if parent_parts:
        try:
            namespaces = svc.list_namespaces(parent_parts)
        except Exception:
            namespaces = []
        try:
            tables = svc.list_tables(parent_parts)
        except Exception:
            tables = []
    ns_html = "".join(_ns_item(parts) for parts in namespaces)
    tbl_html = "".join(_table_item(parent_parts, t) for t in tables)
    if not ns_html and not tbl_html:
        return '<div class="namespace-children empty">No children</div>'
    return f'<div class="namespace-children">{ns_html}{tbl_html}</div>'


def _details_error(message: str) -> str:
    return f'<div class="table-details error">{escape(message)}</div>'


def table_details_partial(svc: CatalogService, table_path: str) -> str:
    """Table-details panel (reference ui.py:170-315): columns with
    nullability + partition flags, partition list, snapshots, current
    snapshot. The LAST dot splits namespace from table; malformed paths
    return the error partial."""
    if "." not in table_path:
        return _details_error("Invalid table path format")
    last_dot = table_path.rfind(".")
    namespace_parts = parse_namespace(table_path[:last_dot])
    table_name = table_path[last_dot + 1 :]
    if not namespace_parts:
        return _details_error("Invalid namespace in table path")
    if not table_name:
        return _details_error("Invalid table name in table path")
    try:
        schema = svc.table_schema(namespace_parts, table_name)
        details = svc.table_details(namespace_parts, table_name)
    except Exception:
        return _details_error(
            "An unexpected error occurred while loading table details."
        )

    rows = "".join(
        "<tr>"
        f"<td>{escape(f.name)}</td>"
        f"<td>{escape(f.type)}</td>"
        f"<td>{'nullable' if f.nullable else 'required'}</td>"
        f"<td>{'partition' if f.is_partition else ''}</td>"
        "</tr>"
        for f in schema
    )
    parts_html = ", ".join(escape(c) for c in details.partition_columns)
    snaps = "".join(
        f'<li data-snapshot-id="{s.snapshot_id}">'
        f"{s.snapshot_id} @ {s.timestamp_ms}"
        f"{' (current)' if s.snapshot_id == details.current_snapshot_id else ''}"
        "</li>"
        for s in details.snapshots
    )
    ns_label = escape(".".join(namespace_parts))
    return (
        f'<div class="table-details" data-table-id="'
        f'{generate_id([*namespace_parts, table_name])}">'
        f"<h2>{ns_label}.{escape(table_name)}</h2>"
        f'<div class="meta">format={escape(details.format)}'
        f" location={escape(details.location or '')}</div>"
        f'<div class="partitions">{parts_html}</div>'
        f'<table class="columns"><thead><tr><th>name</th><th>type</th>'
        f"<th>nullable</th><th>partition</th></tr></thead>"
        f"<tbody>{rows}</tbody></table>"
        f'<ul class="snapshots">{snaps}</ul>'
        f"</div>"
    )
