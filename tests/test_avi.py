"""MJPEG-in-AVI parsing and real video frame sampling: container
roundtrip against a test-local AVI writer (independent: it assembles
its own RIFF tree), tick-to-frame index math, the Spark sample_frames
face with real pixel recovery through decode_jpeg, and the loud
multi-stream/malformed gates."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

import pytest

from etl_instagram_spark.multimodal.avi import parse_avi, sample_frame_indices
from etl_instagram_spark.multimodal.jpeg import decode_jpeg
from test_jpeg import encode_jpeg


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def encode_avi(frames, width, height, mspf, streams=1, declared=None):
    """Test-local AVI writer: RIFF('AVI '){ LIST(hdrl){avih},
    LIST(movi){00dc...} } — 56-byte avih per the public spec."""
    avih = struct.pack(
        "<10I",
        mspf, 0, 0, 0,
        len(frames) if declared is None else declared,
        0, streams, 0, width, height,
    ) + b"\x00" * 16
    hdrl = _list(b"hdrl", _chunk(b"avih", avih))
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _gradient_frames(n, w, h):
    out = []
    for i in range(n):
        px = bytes(((x * 3 + y * 5 + 40 * i) % 256)
                   for y in range(h) for x in range(w))
        out.append(encode_jpeg(px, w, h, 1))
    return out


def test_parse_avi_roundtrip_and_duration():
    w, h, mspf = 16, 16, 40_000  # 25 fps
    frames = _gradient_frames(5, w, h)
    v = parse_avi(encode_avi(frames, w, h, mspf))
    assert (v["width"], v["height"], v["n_frames"]) == (w, h, 5)
    assert v["frames"] == frames  # payloads byte-identical
    assert v["duration_ms"] == 200  # 5 x 40ms exactly
    # odd-length frame payload exercises the word-alignment pad
    odd = frames[0] + b"\x00" if len(frames[0]) % 2 == 0 else frames[0]
    v2 = parse_avi(encode_avi([odd, frames[1]], w, h, mspf))
    assert v2["frames"][0] == odd


def test_sample_frame_indices_dedup_and_cap():
    # 25 fps, tick every 100ms: frames 0, 2, 5, 7 (floor(t*1000/40000))
    assert sample_frame_indices(10, 40_000, 100, 16) == [
        (0, 0), (2, 100), (5, 200), (7, 300),
    ]
    # 1 fps clip sampled every 100ms: each frame emitted ONCE
    assert sample_frame_indices(3, 1_000_000, 100, 16) == [
        (0, 0), (1, 1000), (2, 2000),
    ]
    # cap
    assert len(sample_frame_indices(1000, 1000, 1, 7)) == 7
    with pytest.raises(ValueError, match="every_ms"):
        sample_frame_indices(10, 1000, 0, 5)


def test_loud_gates():
    frames = _gradient_frames(2, 8, 8)
    with pytest.raises(NotImplementedError, match="2-stream"):
        parse_avi(encode_avi(frames, 8, 8, 40_000, streams=2))
    with pytest.raises(ValueError, match="declares"):
        parse_avi(encode_avi(frames, 8, 8, 40_000, declared=9))
    with pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    good = encode_avi(frames, 8, 8, 40_000)
    with pytest.raises(ValueError, match="truncated|missing|no video"):
        parse_avi(good[: len(good) // 2])
    with pytest.raises(ValueError, match="implausible"):
        parse_avi(encode_avi(frames, 0, 8, 40_000))
    with pytest.raises(TypeError):
        parse_avi("not bytes")
    # OpenDML/AVIX continuation segment: a second RIFF after the legacy
    # one holds frames the legacy walk would silently drop — the honest
    # gate refuses instead (avih counts only the first segment, so the
    # total_frames cross-check would NOT fire)
    avix_body = b"AVIX" + _list(
        b"movi", b"".join(_chunk(b"00dc", f) for f in frames)
    )
    two_riff = good + b"RIFF" + struct.pack("<I", len(avix_body)) + avix_body
    with pytest.raises(NotImplementedError, match="OpenDML|AVIX"):
        parse_avi(two_riff)


def test_sample_frames_mjpeg_real_pixels(spark):
    """The Spark face: decoder='mjpeg' emits the ACTUAL stored frames
    under each tick with real header meta, and a sampled frame decodes
    back to its source pixels through decode_jpeg (lossy-exact for the
    flat-field frame, the test_jpeg precedent)."""
    from etl_instagram_spark.multimodal.media import sample_frames

    w, h, mspf = 16, 16, 40_000
    flat = encode_jpeg(bytes([128] * (w * h)), w, h, 1)
    frames = [flat] + _gradient_frames(4, w, h)
    avi = encode_avi(frames, w, h, mspf)
    df = spark.createDataFrame(
        [("clip", bytearray(avi), "video", None)],
        "id string, content binary, media_type string, "
        "meta struct<duration_ms int, fps int, width int, height int>",
    )
    rows = sorted(
        sample_frames(df, every_ms=100, max_frames=16, decoder="mjpeg").collect(),
        key=lambda r: r["ts_ms"],
    )
    # 200ms clip at 25fps ticked every 100ms -> frames 0 and 2
    assert [(r["frame_idx"], r["ts_ms"]) for r in rows] == [(0, 0), (2, 100)]
    assert rows[0]["meta"].asDict() == {
        "duration_ms": 200, "fps": 25, "width": w, "height": h,
    }
    assert bytes(rows[0]["frame"]) == flat
    d = decode_jpeg(bytes(rows[0]["frame"]))
    assert (d["width"], d["height"]) == (w, h)
    assert set(d["pixels"]) == {128}  # flat field decodes exactly


def test_video_near_dup_composition(spark):
    """The full claimed path: sample_frames(decoder='mjpeg') →
    pixel_features over the frame bytes → embedding cosine. Two clips
    that share visual content land near cosine 1 on their sampled
    frames; a different clip does not."""
    import math

    from etl_instagram_spark.multimodal.images import pixel_features
    from etl_instagram_spark.multimodal.media import sample_frames

    w, h, mspf = 32, 32, 40_000

    def grad(i, bias=0):
        return encode_jpeg(
            bytes(((x * 3 + y * 5 + 40 * i + bias) % 256)
                  for y in range(h) for x in range(w)),
            w, h, 1,
        )

    clip_a = encode_avi([grad(0), grad(1)], w, h, mspf)
    # near-dup of clip_a: same content re-encoded with a 1-level bias
    clip_b = encode_avi([grad(0, 1), grad(1, 1)], w, h, mspf)
    clip_c = encode_avi(
        [encode_jpeg(bytes([(x * 91 + y * 53) % 256
                            for y in range(h) for x in range(w)]), w, h, 1)
         for _ in range(2)],
        w, h, mspf,
    )
    df = spark.createDataFrame(
        [("a", bytearray(clip_a)), ("b", bytearray(clip_b)),
         ("c", bytearray(clip_c))],
        "id string, content binary",
    )
    frames = sample_frames(
        df, every_ms=40, max_frames=4, decoder="mjpeg"
    ).select(
        (F.concat_ws("#", "id", F.col("frame_idx").cast("string"))).alias("id"),
        F.col("frame").alias("content"),
    )
    emb = {r["id"]: r["embedding"] for r in pixel_features(frames).collect()}
    assert all(v is not None for v in emb.values())

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        return num / den

    same = cos(emb["a#0"], emb["b#0"])
    diff = cos(emb["a#0"], emb["c#0"])
    assert same > 0.999, same
    assert diff < same - 0.005, (same, diff)
