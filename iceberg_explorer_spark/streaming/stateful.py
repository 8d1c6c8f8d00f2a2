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


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas — the successor API to
# applyInPandasWithState: typed state variables (ValueState/ListState/
# MapState) managed per key by the state store, timers for event/processing
# time, and schema evolution support. The operator below is the same
# online-feature accumulator as user_activity_state, expressed in the new
# API so both stateful surfaces are covered.
# ---------------------------------------------------------------------------

LTV_OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_cents bigint"
)


def _make_ltv_processor():
    """Build the StatefulProcessor lazily (import-safe on Spark < 4)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    class UserLTVProcessor(StatefulProcessor):
        """Per-user lifetime value: a single ValueState tuple
        (n_events, total_cents) updated per micro-batch. Money accumulates
        in integer cents — state survives across batches, so float drift
        would otherwise compound forever."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "ltv",
                StructType(
                    [
                        StructField("n", LongType()),
                        StructField("cents", LongType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            if self._state.exists():
                n, cents = self._state.get()
            else:
                n, cents = 0, 0
            for pdf in rows:
                n += len(pdf)
                cents += int(pdf["cents"].sum())
            self._state.update((n, cents))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_cents": [cents],
                }
            )

        def close(self) -> None:
            pass

    return UserLTVProcessor()


def user_ltv_state(events: DataFrame) -> DataFrame:
    """events (streaming) → per-user lifetime (n_events, total_cents) via
    transformWithStateInPandas. State is partitioned by user_id in the
    state store — per-key size is O(1), total state O(users), and the new
    API's typed state variables give the store a column-level schema it
    can evolve (add a field without discarding state) — the property that
    matters for a feature pipeline running for months."""
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_ltv_processor(),
        outputStructType=LTV_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
