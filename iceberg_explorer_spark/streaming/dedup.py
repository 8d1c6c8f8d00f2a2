"""Streaming exact-dedup: the incremental-ingest story on the streaming
runtime.

The batch incremental family classifies each nightly increment against
persisted digest artifacts (``operators/incremental_artifacts``). This
module is the SAME seen/canon rule with the history side moved into
Structured Streaming's keyed state store: each micro-batch is a "day",
the per-digest GroupState counter is the digest artifact in state-store
form, and the stage vocabulary maps 1:1 onto the batch rule —

- ``kept``: first holder of a never-seen digest, min doc_id in its
  micro-batch group (the batch rule's ``seen = 0 AND is_canon = 1``);
- ``dropped_in_batch``: same digest as a kept doc of the SAME
  micro-batch, larger doc_id (``seen = 0 AND is_canon = 0``);
- ``dropped_vs_history``: digest already counted by any EARLIER
  micro-batch (``seen = 1``) — whether that earlier holder was itself
  kept or dropped is irrelevant, exactly like the artifact path, where
  a kept doc appends the group's digest either way.

Equality with the batch rule is pinned by
``tests/test_streaming.py::test_streaming_exact_dedup_two_day_parity``,
which replays the same two "days" through
``operators.dedup.incremental_exact_flags`` (empty history for day 1,
day 1's digests as the history artifact for day 2) and demands
identical per-doc stages.

Scale notes: the digest is the groupBy key, so state is partitioned
across executors by digest hash — the same key distribution the batch
probe shuffles on — and each state entry is one BIGINT counter per
DISTINCT digest (the corpus's digest cardinality, the same size as the
digest artifact; production backs it with the RocksDB state store).
``GroupStateTimeout.NoTimeout`` is deliberate: dedup history must never
expire — eviction would silently re-admit old duplicates. Per-batch
work is one shuffle of (doc_id, h) increment rows; history never
re-reads, the incremental family's standing bill.

reference: no analogue — training-pipeline extension (the reference's
engine has no streaming runtime; SURVEY.md §2C).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: documents-shaped landing schema (streaming file sources cannot infer)
DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

OUTPUT_SCHEMA = "doc_id bigint, h string, stage string"
STATE_SCHEMA = "n bigint"


def read_documents_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source stream over a documents landing directory, one input
    file per micro-batch — each nightly drop file becomes one "day" of
    the incremental story (production points this at the ingest landing
    path or swaps in Kafka; the downstream plan is unchanged)."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )


def _dedup_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = state.get[0] if state.exists else 0
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("doc_id")
    if seen > 0:
        stages = ["dropped_vs_history"] * len(rows)
    else:
        # the batch is_canon rule VERBATIM: doc_id == group min keeps.
        # Not positional first-row-keeps — on a malformed increment
        # carrying the same doc_id twice, the batch rule marks BOTH
        # rows kept (both equal the min), and the parity contract says
        # the runtimes must agree even there
        min_id = rows["doc_id"].iloc[0]
        stages = [
            "kept" if d == min_id else "dropped_in_batch"
            for d in rows["doc_id"]
        ]
    state.update((seen + len(rows),))
    yield pd.DataFrame(
        {
            "doc_id": rows["doc_id"].to_numpy(),
            "h": [key[0]] * len(rows),
            "stage": stages,
        }
    )


def streaming_exact_dedup(docs: DataFrame) -> DataFrame:
    """documents stream → (doc_id, h, stage) per micro-batch, classified
    against ALL previously processed micro-batches via per-digest state.

    The digest expression is ``operators.dedup.content_digest`` — the
    single definition shared with the batch probe and the persisted
    artifact, so the streaming twin cannot desync from either (the
    NULL-text sentinel rides along: NULL-text docs form one real digest
    group here exactly as they do in the artifact)."""
    from iceberg_explorer_spark.operators.dedup import content_digest

    prepared = docs.select("doc_id", content_digest().alias("h"))
    return prepared.groupBy("h").applyInPandasWithState(
        _dedup_update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
