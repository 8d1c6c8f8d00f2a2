"""Data-layout management: Z-order clustering and small-file compaction.

The reference is read-only over whatever layout its Iceberg tables already
have (reference: src/iceberg_explorer/query/engine.py:86-110 — it can only
ATTACH and scan). At 100 TB, layout IS performance: min/max file skipping
only works when files are clustered on the filter columns, and scan
parallelism collapses under millions of tiny files. These are the two
maintenance operators a lakehouse deployment runs continuously (the
Spark-native analogues of Iceberg's rewrite_data_files with sort/z-order
strategies).

Both are plain DataFrame → write pipelines: one pass, one range shuffle,
executor-side writes — no driver materialization anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension in the interleaved sort key (16 bits × 2 dims = 32-bit
#: morton code; plenty of resolution for file-level clustering)
_BITS = 16


def _morton2(a: Column, b: Column) -> Column:
    """Interleave the low 16 bits of two integer columns into a 32-bit
    Z-curve (Morton) code — bit i of ``a`` lands at position 2i+1, bit i of
    ``b`` at 2i. Pure JVM bit arithmetic, whole-stage-codegen friendly."""
    code = F.lit(0).cast("long")
    for i in range(_BITS):
        code = code.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i))
    return code


def zorder_write(
    df: DataFrame,
    cols: tuple[str, str],
    path: str,
    num_files: int = 8,
) -> None:
    """Rewrite ``df`` as parquet Z-ordered on two columns.

    Each column is min/max-normalized to 16 bits (one tiny agg action — the
    same stats pass Iceberg keeps in manifests), the two are interleaved
    into a Morton code, and the data is range-partitioned + sorted on it.
    Every output file then covers a small rectangle of the (a, b) value
    space, so a predicate on EITHER column prunes most files from their
    parquet/Iceberg min-max stats — the multi-dimensional generalization of
    sorting, which can only serve one column. One range shuffle (with the
    sampling pass range partitioning always does), executor-side writes.
    """
    a, b = cols
    lo_hi = df.select(
        F.min(a).alias("a_lo"),
        F.max(a).alias("a_hi"),
        F.min(b).alias("b_lo"),
        F.max(b).alias("b_hi"),
    ).collect()[0]
    scale = (1 << _BITS) - 1

    def norm(c: str, lo: float, hi: float) -> Column:
        span = max(hi - lo, 1)
        return ((F.col(c) - F.lit(lo)) * scale / F.lit(span)).cast("long")

    keyed = df.withColumn(
        "_zkey",
        _morton2(
            norm(a, lo_hi["a_lo"], lo_hi["a_hi"]),
            norm(b, lo_hi["b_lo"], lo_hi["b_hi"]),
        ),
    )
    (
        keyed.repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Compact a small-file parquet layout into ~target-sized files.

    Millions of tiny files are the classic lakehouse failure mode: every
    scan pays per-file open/footer costs and planning chokes on the
    manifest. This rewrites the dataset into ``ceil(rows/target)`` files via
    a round-robin repartition (no key → no skew). Returns the file count
    written. The Iceberg-native equivalent is rewrite_data_files; this is
    the path-level tool for plain parquet.
    """
    df = spark.read.parquet(src_path)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target_rows_per_file))
    df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    return n_files


def bucketed_write(
    spark,
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
) -> None:
    """Persist ``df`` hash-bucketed (and sorted) on ``key`` so repeat-
    workload joins on that key run WITHOUT a shuffle on either side.

    The fact⋈fact join (orders⋈lineitem on orderkey) is the one join
    broadcast can't save: both sides shuffle on the key every single run.
    Bucketing moves that shuffle to WRITE time, once — both tables land
    pre-hash-partitioned into the same ``n_buckets`` by the same key, and
    every later equi-join on ``key`` reads co-located buckets: Catalyst
    plans a SortMergeJoin with ZERO Exchange (pinned in
    tests/test_plans.py::test_bucketed_join_has_no_exchange). At 100 TB
    this converts the dominant per-query shuffle of a repeat workload into
    a one-time layout cost; choose n_buckets ≈ cluster cores so every core
    owns a bucket. The Iceberg-native equivalent is a ``bucket(N, key)``
    partition transform; this is the Spark-catalog tool (reference is
    read-only over existing layouts — src/iceberg_explorer/query/engine.py:86-110).
    """
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )
