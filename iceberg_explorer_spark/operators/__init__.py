"""Operator library. Importing this package populates the query registry."""

from iceberg_explorer_spark.operators.registry import QUERIES, QuerySpec, query  # noqa: F401

# Import order = registry order; each module registers its queries on import.
from iceberg_explorer_spark.operators import relational  # noqa: E402,F401
from iceberg_explorer_spark.operators import joins  # noqa: E402,F401
from iceberg_explorer_spark.operators import dedup  # noqa: E402,F401
from iceberg_explorer_spark.operators import similarity  # noqa: E402,F401
from iceberg_explorer_spark.operators import text  # noqa: E402,F401
from iceberg_explorer_spark.operators import events  # noqa: E402,F401
from iceberg_explorer_spark.operators import multimodal  # noqa: E402,F401
from iceberg_explorer_spark.operators import pipeline  # noqa: E402,F401
