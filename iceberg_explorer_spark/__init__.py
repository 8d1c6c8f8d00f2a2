"""iceberg_explorer_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference lakehouse explorer (``davzucky/iceberg-explorer``, studied read-only):
the full SELECT surface its SQL gate admits (joins, aggregations, CTEs, window
functions, set ops, introspection), its query-lifecycle service layer
(admission gate, timeout/cancel, NDJSON streaming, CSV export), its catalog
metadata surface — plus large-scale training-data pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing, streaming) designed for
100 TB scale on a real Spark cluster.

Architecture is Spark-first: logical plans are declared with the DataFrame/SQL
API and Catalyst/Tungsten pick the physical strategy. The reference's embedded
DuckDB engine is replaced by Spark SQL; its PyIceberg catalog client by Spark
catalog APIs; its service layer re-implemented natively.
"""

__version__ = "0.1.0"

from iceberg_explorer_spark.session import get_spark, stop_spark  # noqa: F401
