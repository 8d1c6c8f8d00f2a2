"""SQL admission gate: read-only enforcement for the query surface.

The reference gates lexically only (forbidden keywords + allowed prefixes,
reference: src/iceberg_explorer/query/executor.py:43-116). Spark has no
read-only session switch, so this gate is two layers (SURVEY §4 item 1):

1. the reference's lexical rules (cheap pre-filter, identical behavior:
   single statement, allowed prefix, forbidden keywords anywhere), then
2. a *parse-level* check: the statement is parsed by Spark's SQL parser —
   without execution — and the logical plan class is inspected. Query plans
   are admitted; any Command/DDL/DML plan is rejected. This closes the
   holes a lexical gate can't see (e.g. obfuscated writes), while EXPLAIN /
   DESCRIBE / SHOW commands stay admitted like the reference.

Parsing never runs the statement (Spark DDL executes eagerly only on
``spark.sql``; ``sqlParser.parsePlan`` is pure), so the gate is safe to run
on hostile input.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from iceberg_explorer_spark.errors import InvalidSQLError

#: reference executor.py:50-72 — the same 21 keywords
FORBIDDEN_KEYWORDS = (
    "INSERT",
    "UPDATE",
    "DELETE",
    "DROP",
    "CREATE",
    "ALTER",
    "TRUNCATE",
    "REPLACE",
    "MERGE",
    "UPSERT",
    "GRANT",
    "REVOKE",
    "ATTACH",
    "DETACH",
    "COPY",
    "EXPORT",
    "IMPORT",
    "VACUUM",
    "CHECKPOINT",
    "LOAD",
    "INSTALL",
)

ALLOWED_PREFIXES = ("WITH", "SELECT", "EXPLAIN", "DESCRIBE", "DESC", "SHOW", "VALUES")

_FORBIDDEN_RE = re.compile(
    r"\b(" + "|".join(FORBIDDEN_KEYWORDS) + r")\b", re.IGNORECASE
)

#: parsed-plan class names that are commands but read-only → admitted
_READONLY_COMMAND_RE = re.compile(
    r"^(Explain|Describe|Show|SetCatalog|UnresolvedTableSpec)"  # Describe*/Show*
)


def _strip_comments(sql: str) -> str:
    sql = re.sub(r"--[^\n]*", " ", sql)
    sql = re.sub(r"/\*.*?\*/", " ", sql, flags=re.DOTALL)
    return sql


def validate_sql_lexical(sql: str) -> str:
    """Layer 1 — the reference's lexical rules. Returns the stripped SQL."""
    stripped = _strip_comments(sql).strip()
    if not stripped:
        raise InvalidSQLError("empty SQL statement")
    # single statement only (trailing ; tolerated)
    body = stripped.rstrip(";").strip()
    if not body:
        raise InvalidSQLError("empty SQL statement")
    if ";" in body:
        raise InvalidSQLError("multiple statements are not allowed")
    first_word = body.split(None, 1)[0].upper()
    if first_word not in ALLOWED_PREFIXES:
        raise InvalidSQLError(
            f"only {'/'.join(ALLOWED_PREFIXES)} statements are allowed"
        )
    m = _FORBIDDEN_RE.search(body)
    if m:
        raise InvalidSQLError(f"forbidden keyword: {m.group(1).upper()}")
    return body


def validate_sql_plan(spark: SparkSession, sql: str) -> None:
    """Layer 2 — parse (never execute) and reject non-read-only plans."""
    try:
        jplan = (
            spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)
        )
    except Exception as exc:  # parse error → not admissible
        raise InvalidSQLError(f"SQL parse error: {exc}") from exc
    cls = jplan.getClass().getSimpleName()
    if cls.endswith(("Command", "Statement")) or "Insert" in cls or "Write" in cls:
        if not _READONLY_COMMAND_RE.match(cls):
            raise InvalidSQLError(f"non-read-only statement rejected: {cls}")


def validate_sql(spark: SparkSession, sql: str) -> str:
    """Full gate: lexical + plan inspection. Returns the admitted SQL body."""
    body = validate_sql_lexical(sql)
    validate_sql_plan(spark, body)
    return body
