"""Engine errors (analogues of reference query/executor.py exception types)."""

from __future__ import annotations


class EngineError(Exception):
    """Base error."""


class InvalidSQLError(EngineError):
    """SQL rejected by the admission gate (reference: InvalidSQLError,
    src/iceberg_explorer/query/executor.py:43-116)."""


class QueryTimeoutError(EngineError):
    """Query exceeded its timeout (reference: QueryTimeoutError,
    src/iceberg_explorer/query/executor.py:274-283)."""


class QueryNotFoundError(EngineError):
    """Unknown query id in the registry."""


class ExportTooLargeError(EngineError):
    """CSV export exceeded the size cap (reference:
    src/iceberg_explorer/api/routes/export.py:138-149)."""
