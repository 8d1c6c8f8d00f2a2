"""Differential correctness: every registered query with an oracle is run on
Spark and on DuckDB over the same parquet and compared exactly — the local
mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from iceberg_explorer_spark.operators import QUERIES
from tests.conftest import SF_DIR, assert_matches_oracle

ORACLE_QUERIES = [name for name, spec in QUERIES.items() if spec.oracle]
NO_ORACLE = [name for name, spec in QUERIES.items() if not spec.oracle]


def test_check_window_ordering():
    """The driver's correctness gate checks the FIRST 50 registry entries.
    Pin the window: flagship first, every in-window query oracle-bearing, and
    the registry iteration order exactly matches _CHECK_WINDOW."""
    from iceberg_explorer_spark.operators import _CHECK_WINDOW

    names = list(QUERIES)
    assert len(_CHECK_WINDOW) == 50
    assert len(set(_CHECK_WINDOW)) == 50
    assert names[: len(_CHECK_WINDOW)] == _CHECK_WINDOW
    assert names[0] == "pipeline_clean_corpus"
    no_oracle_in_window = [n for n in _CHECK_WINDOW if not QUERIES[n].oracle]
    assert not no_oracle_in_window, no_oracle_in_window


def test_registry_builder_names_match_registration():
    """Every registered builder's __name__ equals its registration name —
    the structural guard for the @query-decorator paste trap (a helper
    pasted between the decorator and the operator's def registers the
    helper under the operator's name; it fired three times before the
    decorator itself started raising on mismatch, and this invariant
    keeps the decorator's guard honest over the whole registry). The
    decorator raise catches the trap at import time; this test pins
    that the guard stays in force (a weakened decorator would surface
    here at pytest time instead of at oracle-compare time)."""
    import pytest

    from iceberg_explorer_spark.operators.registry import query

    bad = [
        (n, s.builder.__name__)
        for n, s in QUERIES.items()
        if s.builder.__name__ != n
    ]
    assert not bad, bad

    # and the decorator itself rejects the mismatch at decoration time
    with pytest.raises(ValueError, match="paste"):
        @query("some_operator_name")
        def helper_pasted_into_the_gap(spark, sf_dir):  # pragma: no cover
            return None
    assert "some_operator_name" not in QUERIES


def _has_decimal(dt) -> bool:
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    if isinstance(dt, DecimalType):
        return True
    if isinstance(dt, StructType):
        return any(_has_decimal(f.dataType) for f in dt.fields)
    if isinstance(dt, ArrayType):
        return _has_decimal(dt.elementType)
    if isinstance(dt, MapType):
        return _has_decimal(dt.keyType) or _has_decimal(dt.valueType)
    return False


@pytest.mark.parametrize("name", list(QUERIES))
def test_no_decimal_output_columns(spark, name):
    """Output-surface contract: exact DECIMAL is an internal aggregation
    representation only; every surfaced money column is DOUBLE. Decimal
    outputs render differently across result-materialization paths
    (``Decimal('139345.00')`` object vs float64 ``139345.0``), which breaks
    representation-sensitive value hashing even when values are identical —
    the round-1 root cause of 11 hash-fail queries. Schema-only check: no
    execution."""
    schema = QUERIES[name].builder(spark, SF_DIR).schema
    offending = [f.name for f in schema.fields if _has_decimal(f.dataType)]
    assert not offending, (
        f"{name}: decimal-typed output columns {offending} — surface as "
        "double via functions.deterministic.sum_money/money"
    )


def test_builders_run_on_default_conf_session(spark):
    """Builders must be correct under the harness's own SparkSession, not
    just the repo's build_session conf (round-1 asof hard-fail: nanosAsLong
    lived only in session conf). Simulate a default-conf session by unsetting
    the confs load_table historically leaned on, then run the events-reading
    builders end-to-end."""
    s = spark.newSession()
    for k in (
        "spark.sql.legacy.parquet.nanosAsLong",
        "spark.sql.parquet.inferTimestampNTZ.enabled",
    ):
        try:
            s.conf.unset(k)
        except Exception:
            pass
    from tests.conftest import SF_DIR_SMALL

    for name in (
        "asof_join_purchase_click",
        "events_tumbling_window",
        "events_funnel",
    ):
        df = QUERIES[name].builder(s, SF_DIR_SMALL)
        assert df.count() >= 0, name


def test_events_ts_dtype_contract(spark):
    """Pin the loader's events.ts normalization: whatever the physical
    flavour (NANOS-as-bigint in older testdata, MICROS-NTZ in current),
    load_table must surface a plain ``timestamp`` column whose instant is
    the file's raw value read as UTC — equal to DuckDB's ``epoch_us`` —
    and must do so under a NON-UTC session timezone (session independence;
    round-3 regression: the NTZ flavour leaked through and 13
    ``unix_micros`` call sites threw)."""
    import duckdb
    from pyspark.sql import functions as F

    from iceberg_explorer_spark.sources.registry import load_table
    from tests.conftest import SF_DIR_SMALL

    s = spark.newSession()
    s.conf.set("spark.sql.session.timeZone", "America/New_York")
    df = load_table(s, SF_DIR_SMALL, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = {
        r["event_id"]: r["us"]
        for r in df.select(
            "event_id", F.unix_micros("ts").alias("us")
        ).limit(50).collect()
    }
    want = dict(
        duckdb.sql(
            "select event_id, epoch_us(ts) from "
            f"read_parquet('{SF_DIR_SMALL}/events.parquet') "
            f"where event_id in ({','.join(map(str, got))})"
        ).fetchall()
    )
    assert got == want


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, oracle, name):
    spec = QUERIES[name]
    df = spec.builder(spark, SF_DIR)
    assert_matches_oracle(df, oracle, spec.oracle, name=name)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_query_runs(spark, name):
    """Weaker rows-only check for non-SQL-expressible operators."""
    spec = QUERIES[name]
    df = spec.builder(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_approx_distinct_hll_within_bound(spark, oracle):
    """HLL has no cross-engine oracle (sketches differ by implementation);
    instead bound the estimate against the exact distinct count. rsd=2%
    guarantees ~2% standard error; assert a generous 10% envelope."""
    est = {
        r["event_type"]: r["approx_users"]
        for r in QUERIES["events_approx_distinct_hll"]
        .builder(spark, SF_DIR)
        .collect()
    }
    exact = dict(
        oracle.execute(
            "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    assert set(est) == set(exact)
    for k, v in exact.items():
        assert abs(est[k] - v) <= max(1, 0.1 * v), (k, est[k], v)


def test_approx_percentile_within_bound(spark, oracle):
    """approx_percentile has no cross-engine oracle (sketch-specific);
    bound each estimate against DuckDB's exact quantile instead. With
    accuracy=10000 on ~1.5k rows/group the GK sketch is near-exact; allow
    1% relative error to stay robust across SFs."""
    got = {
        r["o_orderpriority"]: (r["p50_price"], r["p90_price"], r["p99_price"])
        for r in QUERIES["percentile_approx_order_price"]
        .builder(spark, SF_DIR)
        .collect()
    }
    want = {
        k: (p50, p90, p99)
        for k, p50, p90, p99 in oracle.execute(
            """SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5),
                      quantile_cont(o_totalprice, 0.9),
                      quantile_cont(o_totalprice, 0.99)
               FROM orders GROUP BY o_orderpriority"""
        ).fetchall()
    }
    assert set(got) == set(want)
    for k in want:
        for est, exact in zip(got[k], want[k]):
            assert abs(est - exact) <= 0.01 * exact, (k, est, exact)


def test_hll_sketch_rollup_merge_accuracy(spark, oracle):
    """Merged daily sketches must estimate the same distinct-user counts as
    a direct pass over raw events — the re-aggregability property that
    justifies materializing sketch tables."""
    got = {
        r["event_type"]: r["approx_users"]
        for r in QUERIES["events_hll_sketch_rollup"].builder(spark, SF_DIR).collect()
    }
    exact = dict(
        oracle.execute(
            "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    assert set(got) == set(exact)
    for k, v in exact.items():
        assert abs(got[k] - v) <= max(2, 0.1 * v), (k, got[k], v)


def test_pq_adc_recall_vs_bruteforce(spark):
    """PQ is lossy by design; what must hold is USEFUL recall against the
    exact baseline. With 16 seed-pick codes per subspace the sf0.01 corpus
    recovers ≥5 of the true top-10 — pinned as a floor so a quantization
    regression (wrong argmax, wrong LUT join) reads as a recall collapse,
    not a silent wrong-but-plausible list."""
    pq = {
        r["vec_id"]
        for r in QUERIES["similarity_pq_adc_topk"].builder(spark, SF_DIR).collect()
    }
    exact = {
        r["vec_id"]
        for r in QUERIES["similarity_bruteforce_topk"]
        .builder(spark, SF_DIR)
        .collect()
    }
    assert len(pq & exact) >= 5
