"""Structured Streaming: batch/stream duality — each streaming operator's
drained result must equal its batch twin over the same events data."""

import pytest

from iceberg_explorer_spark.sources.registry import load_table
from iceberg_explorer_spark.streaming.stateful import user_activity_state
from iceberg_explorer_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    session_aggregates,
    sliding_user_counts,
    stream_dedupe,
    tumbling_counts,
)
from tests.conftest import SF_DIR_SMALL


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(cols).collect())


@pytest.fixture(scope="module")
def events_stream(spark):
    return read_events_stream(spark, SF_DIR_SMALL)


@pytest.fixture(scope="module")
def events_batch(spark):
    return load_table(spark, SF_DIR_SMALL, "events")


def test_tumbling_stream_equals_batch(spark, events_stream, events_batch):
    got = run_to_memory(tumbling_counts(events_stream), "t_tumbling")
    want = tumbling_counts(events_batch)
    cols = ["window_start_us", "event_type", "n_events", "total_value"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_sliding_stream_equals_batch(spark, events_stream, events_batch):
    got = run_to_memory(sliding_user_counts(events_stream), "t_sliding")
    want = sliding_user_counts(events_batch)
    cols = ["window_start_us", "n_events"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_session_stream_equals_batch(spark, events_stream, events_batch):
    got = run_to_memory(session_aggregates(events_stream), "t_session")
    want = session_aggregates(events_batch)
    cols = ["user_id", "session_start_us", "n_events", "total_value"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_session_matches_batch_operator(spark, events_batch):
    """The native session_window twin agrees with the lag+prefix-sum batch
    sessionizer in operators/events.py on (user, start, n, total)."""
    from iceberg_explorer_spark.operators.registry import QUERIES

    native = session_aggregates(events_batch)
    manual = QUERIES["events_session_window"].builder(spark, SF_DIR_SMALL)
    cols = ["user_id", "session_start_us", "n_events", "total_value"]
    assert _sorted_rows(native, cols) == _sorted_rows(manual, cols)


def test_stream_dedupe(spark, events_stream, events_batch):
    got = run_to_memory(
        stream_dedupe(events_stream), "t_dedupe", output_mode="append"
    )
    assert got.count() == events_batch.count()  # event_ids are unique
    assert got.select("event_id").distinct().count() == events_batch.count()


def test_stateful_user_activity(spark, events_stream, events_batch):
    got = run_to_memory(
        user_activity_state(events_stream), "t_state", output_mode="update"
    )
    # terminal state per user == batch aggregate
    from pyspark.sql import functions as F

    want = events_batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.unix_micros("ts")).alias("last_seen_us"),
    )
    got_last = (
        got.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("last_seen_us").alias("last_seen_us"),
        )
    )
    cols = ["user_id", "n_events", "last_seen_us"]
    assert _sorted_rows(got_last, cols) == _sorted_rows(want, cols)
