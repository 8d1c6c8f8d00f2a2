"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
every implemented operator from SURVEY.md §2 (+ extensions); ``oracle_sql()``
gives the DuckDB-equivalent SQL for the driver's differential correctness
gate. The registry lives in ``iceberg_explorer_spark.operators``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iceberg_explorer_spark.operators import QUERIES  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"
_FLAGSHIP = "pipeline_clean_corpus"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: the composed corpus-curation pipeline (quality
    gate → exact dedup → LSH near-dup removal → token accounting)."""
    return QUERIES[_FLAGSHIP].builder(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.builder for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}
