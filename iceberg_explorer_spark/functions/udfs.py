"""User-facing UDF registration surface.

The reference exposes NO UDF/UDAF registration — users get only DuckDB's
built-ins (SURVEY §2C). Spark makes a registered-function surface natural,
so the rebuild provides one, with the discipline the 100 TB design demands:
every function here is an Arrow-vectorized ``pandas_udf`` (columnar batch
transfer, NumPy compute), never a row-at-a-time Python UDF — the 10-100×
difference the hot path can't afford. Built-ins still beat any UDF; these
exist for logic ``pyspark.sql.functions`` genuinely can't express.

``register_udfs(spark)`` makes them callable from the SQL surface (the
service layer's admitted SELECT grammar), e.g.::

    SELECT doc_id, quantize_embedding(embedding) AS q FROM embeddings
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, ByteType, DoubleType


# Return types are DataType OBJECTS, not DDL strings: the decorator parses a
# DDL string through the active SparkContext, which makes module import
# require a running session — an import-order landmine for library users.
@pandas_udf(ArrayType(ByteType()))
def quantize_embedding(vectors: pd.Series) -> pd.Series:
    """Symmetric int8 quantization of a float embedding (per-vector max-abs
    scaling): x → round(127 · x / max|x|). Shrinks embedding storage 4×
    ahead of ANN indexing; deterministic per vector, so quantized tables
    are reproducible across partitionings.

    Vectorized: each Arrow batch becomes one NumPy matrix operation.
    """
    import numpy as np

    def q(v):
        a = np.asarray(v, dtype=np.float64)
        m = np.max(np.abs(a))
        if m == 0.0:
            return np.zeros(len(a), dtype=np.int8)
        return np.round(a / m * 127.0).astype(np.int8)

    return vectors.map(q)


@pandas_udf(DoubleType())
def median_abs_dev(values: pd.Series) -> float:
    """Grouped-aggregate pandas UDF (the UDAF shape): median absolute
    deviation — a robust spread measure Spark has no built-in for. Arrives
    as one Arrow batch per group; at scale prefer groups ≪ executor memory
    or switch to an approximate sketch.
    """
    med = values.median()
    return float((values - med).abs().median())


def register_udfs(spark: SparkSession) -> None:
    """Register all engine UDFs for SQL-surface use."""
    spark.udf.register("quantize_embedding", quantize_embedding)
    spark.udf.register("median_abs_dev", median_abs_dev)
