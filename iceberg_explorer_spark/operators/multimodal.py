"""Multimodal column plumbing (north-star extension).

Image/audio/video payloads are modeled as opaque ``binary`` columns plus
typed metadata — the lakehouse-native layout for multimodal training data.
Since no media decoders ship in this environment, the decode step is a
clearly-marked stub (deterministic fake features via a try-import gate); the
Spark-side plumbing — binary columns, metadata extraction, Arrow-batched
``mapInPandas`` with an iterator signature, stable output schema — is real
and is what matters at 100 TB: batches stream through Python via Arrow
without materializing a partition at once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_explorer_spark.operators.registry import query
from iceberg_explorer_spark.sources.registry import load_table

_DECODE_SCHEMA = (
    "doc_id bigint, byte_len bigint, decode_status string, fake_dim int, "
    "feature array<double>"
)


def _decode_payload(payload: bytes) -> tuple[str, list[float]]:
    """Decode stub. A real deployment plugs PIL/torchaudio/decord in here;
    this container has none, so we return a deterministic fake feature
    derived from the payload bytes (NOT a hash of Python's id/randomness —
    reruns must agree)."""
    try:
        import PIL.Image  # noqa: F401  — not present in this container

        raise NotImplementedError("real image decode not wired up yet")
    except ImportError:
        # Deterministic fake: 4 doubles from the first bytes of the payload.
        head = (payload[:4] + b"\x00" * 4)[:4]
        return "stub", [b / 255.0 for b in head]


def decode_features(binary_df: DataFrame) -> DataFrame:
    """mapInPandas decode operator: (doc_id, payload binary) → features.

    Iterator-of-batches signature so a 100 MB Arrow batch streams through
    Python without materializing the whole partition; batch size is governed
    by spark.sql.execution.arrow.maxRecordsPerBatch.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            status_feats = [_decode_payload(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": [len(p) for p in pdf["payload"]],
                    "decode_status": [s for s, _ in status_feats],
                    "fake_dim": [len(f) for _, f in status_feats],
                    "feature": [f for _, f in status_feats],
                }
            )

    return binary_df.mapInPandas(op, schema=_DECODE_SCHEMA)


@query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS content_digest,
           CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 'image'
                WHEN octet_length(encode(text)) % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality
    FROM documents
    """,
    doc="Typed metadata over opaque binary payloads: byte length, content "
    "digest, modality tag — computed JVM-side on the binary column, no "
    "decode needed. (documents.text stands in for the payload bytes.)",
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    blen = F.octet_length(payload).cast("bigint")
    return docs.select(
        "doc_id",
        blen.alias("byte_len"),
        F.md5(payload).alias("content_digest"),
        F.when(blen % 3 == 0, "image")
        .when(blen % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
    )


@query(
    "multimodal_decode_features",
    oracle=None,  # mapInPandas decode stub — not SQL-expressible; rows-only check
    doc="Arrow-batched decode pipeline: binary payload → mapInPandas stub "
    "decoder → (status, feature vector). The plumbing (schema, iterator "
    "batching, binary transport) is real; the decoder is a deterministic "
    "stub pending real media libraries.",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    binary_df = docs.select("doc_id", F.col("text").cast("binary").alias("payload"))
    return decode_features(binary_df)


FRAME_BYTES = 16
FRAME_STRIDE = 4


@query(
    "multimodal_frame_sample",
    oracle=f"""
    -- DuckDB substring() is VARCHAR/character-based (no BLOB overload); the
    -- synthetic corpus is pure ASCII so characters == bytes and the digests
    -- agree with Spark's byte-based substring over the binary payload.
    SELECT doc_id, i AS frame_idx,
           md5(substring(text, CAST(i * {FRAME_BYTES} + 1 AS BIGINT),
                         {FRAME_BYTES})) AS frame_digest
    FROM documents,
         UNNEST(generate_series(0,
             CAST(FLOOR(octet_length(encode(text)) / {FRAME_BYTES}) AS BIGINT)
               - 1)) AS t(i)
    WHERE i % {FRAME_STRIDE} = 0
    """,
    doc=f"Frame sampling over opaque video-like payloads: chunk the binary "
    f"column into {FRAME_BYTES}-byte frames, keep every {FRAME_STRIDE}th, "
    "digest each sampled frame — entirely JVM-side (sequence + substring on "
    "binary, no Python, no decode). This is the partition-parallel shape of "
    "real frame sampling: per-row expansion with zero shuffle; a real "
    "deployment swaps the digest for a decoder call in the mapInPandas "
    "stage (decode_features) AFTER sampling has cut the data volume.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    # FLOOR on both engines: a bare double→bigint cast truncates in Spark
    # but ROUNDS in DuckDB, silently changing the frame count
    n_frames = F.floor(F.octet_length(payload) / FRAME_BYTES).cast("bigint")
    # Guard the sub-frame payload: Spark's sequence(0, -1) yields a
    # DESCENDING [0, -1] (frame 0 would survive the stride filter and emit a
    # spurious short-frame digest) while DuckDB's generate_series(0, -1) is
    # empty — emit an empty frame list explicitly when n_frames == 0.
    frame_idxs = F.when(
        n_frames > 0, F.sequence(F.lit(0).cast("bigint"), n_frames - 1)
    ).otherwise(F.array().cast("array<bigint>"))
    return (
        docs.select(
            "doc_id",
            payload.alias("payload"),
            F.explode(frame_idxs).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % FRAME_STRIDE == 0)
        .select(
            "doc_id",
            "frame_idx",
            F.md5(
                F.expr(f"substring(payload, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})")
            ).alias("frame_digest"),
        )
    )
