"""Multimodal column plumbing (north-star extension).

Image/audio/video payloads are modeled as opaque ``binary`` columns plus
typed metadata — the lakehouse-native layout for multimodal training data.
The decode stage is REAL for two self-describing formats that need no media
libraries: binary PPM (P6) images and RIFF/WAVE PCM audio, parsed in pure
Python with per-channel statistics as the extracted features. Heavier
codecs (JPEG/MP4/...) would plug into the same ``mapInPandas`` operator —
the Spark-side contract (binary columns, Arrow iterator batching, stable
output schema) is identical; batches stream through Python without
materializing a partition at once.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_explorer_spark.operators.registry import query
from iceberg_explorer_spark.sources.registry import load_table, repartition_for_compute

_DECODE_SCHEMA = (
    "doc_id bigint, decode_status string, format string, width int, "
    "height int, n_channels int, mean_c0 double, mean_c1 double, "
    "mean_c2 double"
)


class _Decoded:
    __slots__ = ("status", "format", "width", "height", "n_channels", "means")

    def __init__(
        self,
        status: str,
        format: str = "unknown",
        width: Optional[int] = None,
        height: Optional[int] = None,
        n_channels: Optional[int] = None,
        means: Optional[list[float]] = None,
    ) -> None:
        self.status = status
        self.format = format
        self.width = width
        self.height = height
        self.n_channels = n_channels
        self.means = (means or []) + [None] * (3 - len(means or []))


def decode_ppm(payload: bytes) -> _Decoded:
    """Parse a binary PPM (P6): header tokens (magic, width, height, maxval,
    with ``#`` comments) then raw RGB bytes; features = per-channel means.

    Real parser, real stats — no stub. Deterministic: channel mean is an
    exact integer sum divided once in double.
    """
    if payload[:2] != b"P6":
        return _Decoded("bad_magic")
    # tokenize header: magic, width, height, maxval separated by whitespace,
    # '#' starts a comment through end-of-line
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3 and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < len(payload) and payload[j : j + 1].isdigit():
                j += 1
            tokens.append(int(payload[i:j]))
            i = j
        else:
            return _Decoded("bad_header", "ppm")
    if len(tokens) < 3 or i >= len(payload):
        return _Decoded("bad_header", "ppm")
    width, height, maxval = tokens
    if maxval > 255 or width <= 0 or height <= 0:
        return _Decoded("unsupported", "ppm", width, height)
    i += 1  # the single whitespace byte after maxval
    pixels = payload[i : i + width * height * 3]
    if len(pixels) < width * height * 3:
        return _Decoded("truncated", "ppm", width, height, 3)
    n = width * height
    means = [sum(pixels[c::3]) / float(n) for c in range(3)]
    return _Decoded("ok", "ppm", width, height, 3, means)


def decode_wav(payload: bytes) -> _Decoded:
    """Parse RIFF/WAVE with 16-bit PCM: walk the chunk list to ``fmt `` and
    ``data``, then per-channel mean amplitude (exact integer sum / count)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return _Decoded("bad_magic")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        return _Decoded("bad_header", "wav")
    audio_format, n_channels, _rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_format != 1 or bits != 16 or n_channels < 1 or n_channels > 3:
        return _Decoded("unsupported", "wav", None, None, n_channels)
    n_frames = len(data) // (2 * n_channels)
    if n_frames == 0:
        return _Decoded("truncated", "wav", None, None, n_channels)
    samples = struct.unpack(f"<{n_frames * n_channels}h", data[: n_frames * n_channels * 2])
    means = [
        sum(samples[c::n_channels]) / float(n_frames) for c in range(n_channels)
    ]
    return _Decoded("ok", "wav", None, None, n_channels, means)


def decode_payload(payload: bytes) -> _Decoded:
    """Dispatch on magic bytes — the shape a real multi-codec decode stage
    has. Unknown formats are reported, never raised: one corrupt payload
    must not kill a 100 TB job."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    return _Decoded("bad_magic")


def decode_features(binary_df: DataFrame) -> DataFrame:
    """mapInPandas decode operator: (doc_id, payload binary) → per-channel
    feature stats.

    Iterator-of-batches signature so a 100 MB Arrow batch streams through
    Python without materializing the whole partition; batch size is governed
    by spark.sql.execution.arrow.maxRecordsPerBatch.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_payload(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "decode_status": [d.status for d in decoded],
                    "format": [d.format for d in decoded],
                    "width": pd.array([d.width for d in decoded], dtype="Int32"),
                    "height": pd.array([d.height for d in decoded], dtype="Int32"),
                    "n_channels": pd.array(
                        [d.n_channels for d in decoded], dtype="Int32"
                    ),
                    "mean_c0": [d.means[0] for d in decoded],
                    "mean_c1": [d.means[1] for d in decoded],
                    "mean_c2": [d.means[2] for d in decoded],
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


#: 2×2 P6 header for the synthetic decode corpus (11 bytes, then 12 RGB bytes)
_PPM_W = _PPM_H = 2
_PPM_HEADER = b"P6\n2 2\n255\n"
_PPM_PIX = _PPM_W * _PPM_H * 3


#: Both engines frame the SAME ascii-sanitized projection of the text (strip
#: every non-ASCII char before byte-framing). DuckDB cannot slice BLOBs, so
#: its side of the oracle is necessarily character-based — sanitizing first
#: makes chars == bytes BY CONSTRUCTION instead of by corpus accident, so a
#: future non-ASCII document cannot diverge the gate.
_ASCII_ONLY_RE = r"[^\x01-\x7F]"


def _ppm_mean_sql(channel: int) -> str:
    """DuckDB per-channel mean over the ascii-sanitized text bytes the
    payload embeds (``t``: chars == bytes by construction)."""
    terms = " + ".join(
        f"ord(substr(t, {channel + 1 + 3 * p}, 1))" for p in range(_PPM_W * _PPM_H)
    )
    return f"({terms}) / {float(_PPM_W * _PPM_H)}"


@query(
    "multimodal_decode_features",
    oracle=f"""
    WITH a AS (
      SELECT doc_id, regexp_replace(text, '{_ASCII_ONLY_RE}', '', 'g') AS t
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN length(t) >= {_PPM_PIX} THEN 'ok' ELSE 'truncated' END
             AS decode_status,
           'ppm' AS format,
           CAST({_PPM_W} AS INTEGER) AS width,
           CAST({_PPM_H} AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS n_channels,
           CASE WHEN length(t) >= {_PPM_PIX} THEN {_ppm_mean_sql(0)} END AS mean_c0,
           CASE WHEN length(t) >= {_PPM_PIX} THEN {_ppm_mean_sql(1)} END AS mean_c1,
           CASE WHEN length(t) >= {_PPM_PIX} THEN {_ppm_mean_sql(2)} END AS mean_c2
    FROM a
    """,
    doc="Arrow-batched decode pipeline with a REAL decoder: each document's "
    "first 12 bytes are framed as a 2×2 binary PPM (header built JVM-side), "
    "then mapInPandas runs the pure-Python P6 parser (decode_ppm — magic/"
    "dims/maxval/comments) and extracts per-channel pixel means as the "
    "features. The oracle recomputes the identical means from the raw text "
    "bytes, so header parsing, pixel slicing, and the stats are all "
    "correctness-gated. Exact integer sums / one double division → "
    "bit-identical across engines.",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = repartition_for_compute(load_table(spark, sf_dir, "documents"))
    ascii_text = F.regexp_replace(F.col("text"), _ASCII_ONLY_RE, "")
    payload = F.concat(
        F.lit(_PPM_HEADER), F.substring(ascii_text.cast("binary"), 1, _PPM_PIX)
    )
    binary_df = docs.select("doc_id", payload.alias("payload"))
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
