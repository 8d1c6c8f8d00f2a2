"""Training-pipeline text operators on CRAFTED corpora.

The synthetic documents table contains no emails/phones and only incidental
repetition, so these tests build tiny parquet corpora with known PII,
known benchmark contamination, and known repetition, then run the SAME
builder + oracle pair the driver runs — differential evidence on inputs
that actually exercise every branch.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_explorer_spark.operators import QUERIES


def _write_documents(tmp_path, rows):
    """rows: list of (doc_id, text, lang, source)."""
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _oracle_for(tmp_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{tmp_dir}/documents.parquet')"
    )
    return con


def _run_both(spark, tmp_dir, name):
    from tests.conftest import assert_matches_oracle

    con = _oracle_for(tmp_dir)
    df = QUERIES[name].builder(spark, tmp_dir)
    assert_matches_oracle(df, con, QUERIES[name].oracle, name)
    return {r["doc_id"]: r for r in df.toPandas().to_dict("records")} if "doc_id" in df.columns else df.toPandas()


PII_ROWS = [
    (1, "contact alice.smith+spam@example.co.uk for details", "en", "src0"),
    (2, "call 555-123-4567 or 800.555.1212 today", "en", "src0"),
    (3, "customer alpha met customer beta and customer gamma", "en", "src1"),
    (4, "no sensitive content in this row at all", "en", "src1"),
    (5, "mixed: bob@corp.io and 555-867-5309 and customer delta", "en", "src2"),
]


def test_pii_redact_crafted_matches_oracle_and_redacts(spark, tmp_path):
    tmp = _write_documents(tmp_path, PII_ROWS)
    by_id = _run_both(spark, tmp, "text_pii_redact")
    assert by_id[1]["n_emails"] == 1
    assert by_id[2]["n_phones"] == 2
    assert by_id[3]["n_entities"] == 3
    assert by_id[4]["n_emails"] == by_id[4]["n_phones"] == by_id[4]["n_entities"] == 0
    assert by_id[5]["n_emails"] == by_id[5]["n_phones"] == by_id[5]["n_entities"] == 1
    # the rewrite really happened: redacted length differs from the original
    # wherever a match fired, equals it where nothing matched
    for i in (1, 2, 3, 5):
        assert by_id[i]["redacted_len"] != len(PII_ROWS[i - 1][1])
    assert by_id[4]["redacted_len"] == len(PII_ROWS[3][1])


DECON_ROWS = [
    # doc_id 50 → benchmark member (doc_id % 50 == 0)
    (50, "the quick brown fox jumps over the lazy dog", "en", "bench"),
    # copies a 3-gram run from the benchmark → contaminated
    (1, "totally unrelated but quick brown fox appears here", "en", "train"),
    # disjoint vocabulary → clean
    (2, "alpha beta gamma delta epsilon zeta eta theta", "en", "train"),
]


def test_decontaminate_flags_overlap_only(spark, tmp_path):
    tmp = _write_documents(tmp_path, DECON_ROWS)
    by_id = _run_both(spark, tmp, "text_decontaminate")
    assert 50 not in by_id  # benchmark docs are not scored
    assert by_id[1]["n_contaminated"] == 1  # "quick brown fox"
    assert by_id[2]["n_contaminated"] == 0
    assert by_id[1]["contamination_ratio"] > 0
    assert by_id[2]["contamination_ratio"] == 0.0


REP_ROWS = [
    (1, "spam spam spam spam spam spam spam spam", "en", "src0"),
    (2, "one two three four five six seven eight nine ten", "en", "src0"),
    # duplicated 2-gram chain without one dominant word
    (3, "ab cd ab cd ab cd ab cd ab cd", "en", "src1"),
]


def test_repetition_filter_crafted(spark, tmp_path):
    tmp = _write_documents(tmp_path, REP_ROWS)
    by_id = _run_both(spark, tmp, "text_repetition_filter")
    assert by_id[1]["is_repetitive"] and by_id[1]["top_word_frac"] == 1.0
    assert not by_id[2]["is_repetitive"]
    assert by_id[3]["is_repetitive"] and by_id[3]["dup_2gram_frac"] > 0.4


def test_domain_mix_rates_react_to_skew(spark, tmp_path):
    # source "big" has 40 docs, "tiny" has 2: the computed rate must cap at
    # 1.0 for tiny (keep everything) and downsample big toward the target
    rows = [(i, f"doc number {i} from the big source", "en", "big") for i in range(40)]
    rows += [(100 + i, f"doc number {i} tiny", "en", "tiny") for i in range(2)]
    tmp = _write_documents(tmp_path, rows)
    pdf = _run_both(spark, tmp, "pipeline_domain_mix").set_index("source")
    assert pdf.loc["tiny", "target_rate"] == 1.0
    assert pdf.loc["tiny", "n_kept"] == 2
    # target_n = ceil(0.4 * 21) = 9 of 40 → rate 0.225
    assert pdf.loc["big", "target_rate"] == pytest.approx(0.225)
    assert pdf.loc["big", "n_kept"] <= pdf.loc["big", "n_total"]


def test_decontaminate_broadcasts_benchmark(spark):
    """Scale pin: the benchmark gram set reaches the corpus via broadcast —
    corpus shingles are never shuffled for the membership join."""
    from iceberg_explorer_spark.plans import inspect as pi
    from tests.conftest import SF_DIR_SMALL

    df = QUERIES["text_decontaminate"].builder(spark, SF_DIR_SMALL)
    assert pi.broadcast_join_count(df) >= 1
    assert pi.sort_merge_join_count(df) == 0


def test_pii_redact_is_pure_map(spark):
    """PII redaction is embarrassingly parallel: zero shuffles, whole plan
    in one codegen span over the scan."""
    from iceberg_explorer_spark.plans import inspect as pi
    from tests.conftest import SF_DIR_SMALL

    df = QUERIES["text_pii_redact"].builder(spark, SF_DIR_SMALL)
    assert pi.shuffle_count(df) == 0
    assert pi.broadcast_join_count(df) == 0
