"""Source/sink connectors: CSV and JSON round-trips through the distributed
writers and the reader entry points (gap in the reference — SURVEY §2C:
Iceberg-only scans, no raw-file connectors)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_explorer_spark.service.export import write_csv_distributed
from iceberg_explorer_spark.sources.registry import (
    load_table,
    read_csv,
    read_json,
)
from tests.conftest import SF_DIR_SMALL


def _nation_projection(spark):
    # stable, small, all-simple-types projection for text-format round-trips
    return load_table(spark, SF_DIR_SMALL, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )


def _load_orders(spark):
    return load_table(spark, SF_DIR_SMALL, "orders")


def test_csv_roundtrip_distributed(spark, tmp_path):
    src = _nation_projection(spark)
    out = str(tmp_path / "nation_csv")
    write_csv_distributed(src, out)
    back = read_csv(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    # inferSchema restores the integer columns, not strings
    assert dict(back.dtypes)["n_nationkey"] in ("int", "bigint")


def test_csv_reader_respects_explicit_schema(spark, tmp_path):
    src = _nation_projection(spark)
    out = str(tmp_path / "nation_csv2")
    write_csv_distributed(src, out)
    back = read_csv(spark, out, schema="n_nationkey long, n_name string, n_regionkey long")
    assert dict(back.dtypes) == {
        "n_nationkey": "bigint",
        "n_name": "string",
        "n_regionkey": "bigint",
    }
    assert back.count() == src.count()


def test_json_roundtrip(spark, tmp_path):
    src = _nation_projection(spark)
    out = str(tmp_path / "nation_json")
    src.write.mode("overwrite").json(out)
    back = read_json(spark, out).select("n_nationkey", "n_name", "n_regionkey")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_csv_roundtrip_preserves_nulls_and_specials(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, None, 'a,"b"'), (2, "x\ny", None)],
        "id long, a string, b string",
    )
    out = str(tmp_path / "specials_csv")
    write_csv_distributed(src, out)
    back = read_csv(
        spark, out, schema="id long, a string, b string", multiline=True
    ).withColumn("id", F.col("id"))
    assert sorted(map(tuple, back.collect()), key=str) == sorted(
        map(tuple, src.collect()), key=str
    )


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from iceberg_explorer_spark.plans import inspect as pi
    from iceberg_explorer_spark.sources.registry import read_orc, write_orc

    src = _nation_projection(spark)
    out = str(tmp_path / "nation_orc")
    write_orc(src, out)
    back = read_orc(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    assert dict(back.dtypes) == dict(src.dtypes)  # ORC keeps types exactly
    # predicate pushdown reaches the ORC scan just like parquet
    filtered = back.filter(back.n_regionkey == 2).select("n_name")
    assert "n_regionkey" in " ".join(pi.pushed_filters(filtered))


def test_zorder_write_improves_both_dim_spans(spark, tmp_path):
    """Z-ordering must shrink per-file min/max spans on BOTH dimensions —
    the property that makes parquet/Iceberg stats-based file skipping work
    for predicates on either column. Verified from the actual parquet
    footers, i.e. exactly the stats a scan planner would prune with."""
    import glob

    import pyarrow.parquet as pq

    from iceberg_explorer_spark.sources.layout import zorder_write

    orders = _load_orders(spark)
    out = str(tmp_path / "orders_z")
    zorder_write(orders, ("o_custkey", "o_orderkey"), out, num_files=8)

    back = spark.read.parquet(out)
    assert back.count() == orders.count()

    def spans(path, col, lo, hi):
        fr = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col:
                        mins.append(c.statistics.min)
                        maxs.append(c.statistics.max)
            fr.append((max(maxs) - min(mins)) / (hi - lo))
        return fr

    import pyspark.sql.functions as F

    stats = orders.select(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_orderkey"), F.max("o_orderkey"),
    ).collect()[0]
    cust_spans = spans(out, "o_custkey", stats[0], stats[1])
    key_spans = spans(out, "o_orderkey", stats[2], stats[3])
    # every file covers a bounded rectangle of the 2-D space: both
    # dimensions must be well below full-range (an unsorted or 1-D-sorted
    # layout leaves one dimension at ~1.0 span in every file)
    assert sum(cust_spans) / len(cust_spans) < 0.6, cust_spans
    assert sum(key_spans) / len(key_spans) < 0.6, key_spans


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    import glob

    from iceberg_explorer_spark.sources.layout import compact_parquet

    orders = _load_orders(spark)
    src = str(tmp_path / "orders_fragmented")
    orders.repartition(32).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 32

    dst = str(tmp_path / "orders_compact")
    n = compact_parquet(spark, src, dst, target_rows_per_file=10**6)
    files = glob.glob(f"{dst}/part-*.parquet")
    assert len(files) == n == 1  # 1.5k rows fit one target-sized file
    assert spark.read.parquet(dst).count() == orders.count()


def test_no_rdd_access_in_package():
    """.rdd forces full plan analysis through the deprecated RDD conversion
    path; the package derives scan width from inputFiles() + split math
    instead. Pin it so the access pattern cannot creep back in."""
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parents[1] / "iceberg_explorer_spark"
    hits = [
        f"{p}:{i}"
        for p in pkg.rglob("*.py")
        for i, line in enumerate(p.read_text().splitlines(), 1)
        if ".rdd" in line and not line.lstrip().startswith(("#", "``", '"', "'"))
        and "``.rdd``" not in line and "df.rdd`` (" not in line
    ]
    assert hits == [], f".rdd accessed in: {hits}"


def test_repartition_for_compute_spreads_single_split_scan(spark):
    """A table that fits one parquet split must be spread to cluster width
    before Python-heavy map work; a wide scan must pass through untouched."""
    from iceberg_explorer_spark.sources.registry import repartition_for_compute
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    spread = repartition_for_compute(docs)
    n = spread.toDF(*spread.columns).withColumn("p", F.spark_partition_id())
    assert n.select("p").distinct().count() >= 2
    # non-file-based plans (in-memory ranges) pass through unchanged
    rng = spark.range(10)
    assert repartition_for_compute(rng) is rng
