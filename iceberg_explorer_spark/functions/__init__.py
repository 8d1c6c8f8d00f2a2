from iceberg_explorer_spark.functions.deterministic import (  # noqa: F401
    avg_exact,
    dec,
    sum_dec,
)
