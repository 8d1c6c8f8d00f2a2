from iceberg_explorer_spark.functions.deterministic import (  # noqa: F401
    avg_exact,
    dec,
    money,
    sum_dec,
    sum_money,
)
