"""Bucketed co-located joins: the repeat-workload answer to fact⋈fact
shuffles.

`orders ⋈ lineitem ON orderkey` shuffles BOTH tables on every query. When
the join is a standing workload, write both sides bucketed (and sorted) by
the join key once; every subsequent join reads co-located buckets and the
exchange disappears from the plan — at 100 TB that's the difference between
moving the two largest tables across the network per query and moving
nothing. (Iceberg expresses the same contract as a `bucket(N, key)`
partition transform; the Spark bucketed-table form below is the
catalog-agnostic equivalent.)

The claim is enforced by `tests/test_plans.py::test_bucketed_join_no_shuffle`:
SortMergeJoin present, zero Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from iceberg_explorer_spark.sources.registry import load_table


def write_bucketed(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    key: str,
    n_buckets: int = 16,
    name: str | None = None,
) -> str:
    """Write a test-data table as a bucketed+sorted managed table; returns
    the table name. Bucket count is a contract shared by both join sides —
    at cluster scale pick it so each bucket is a few hundred MB."""
    name = name or f"bucketed_{table}"
    df = load_table(spark, sf_dir, table)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(name)
    )
    return name


def bucketed_join(
    spark: SparkSession, left: str, right: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. The merge hint
    keeps the comparison honest at test scale (tiny sides would otherwise
    broadcast); with matching bucket specs the SMJ needs no exchange and —
    because buckets are sorted — no sort either."""
    lt = spark.table(left).hint("merge")
    rt = spark.table(right)
    return lt.join(rt, on=key)
