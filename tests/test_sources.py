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
