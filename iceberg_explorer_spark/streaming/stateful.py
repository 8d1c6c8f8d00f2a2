"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the escape hatch for operators Spark's built-in windowing can't
express: arbitrary per-key state evolved batch-by-batch. Here: a per-user
activity accumulator that tracks lifetime event count, value sum, and the
last-seen timestamp — the online-feature-store shape of a training pipeline.

State is per-key and partitioned by the groupBy key, so it scales to any
number of users across executors; the watermark bounds how long idle state
must be kept (GroupStateTimeout).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_seen_us bigint"
STATE_SCHEMA = "n bigint, total double, last_us bigint"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last_us = max(last_us, int(pdf["ts_us"].max()))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_seen_us": [last_us],
        }
    )


def user_activity_state(events: DataFrame) -> DataFrame:
    """events (streaming, with ts timestamp) → per-user running aggregates."""
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id", "value", F.unix_micros("ts").alias("ts_us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
