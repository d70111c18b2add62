"""Metadata faces for the gated codecs (r18): webp_dims header parse
across all three container flavors + the decode_images('webp') Spark
face, and mp3_info's frame-header walk with the published bitrate /
sample-rate tables — headers built by independent test-local writers
straight from the public layouts."""

from __future__ import annotations

import struct

import pytest

from etl_instagram_spark.multimodal.mp3 import mp3_info
from etl_instagram_spark.multimodal.webp import webp_dims


# ---------------------------------------------------------------------------
# WebP
# ---------------------------------------------------------------------------


def _webp(fourcc: bytes, body: bytes) -> bytes:
    chunk = fourcc + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _vp8l(width: int, height: int, alpha: int = 0, version: int = 0) -> bytes:
    bits = (width - 1) | ((height - 1) << 14) | (alpha << 28) | (version << 29)
    return _webp(b"VP8L", bytes([0x2F]) + struct.pack("<I", bits) + b"\x00" * 8)


def _vp8(width: int, height: int) -> bytes:
    body = (
        b"\x00\x00\x00"  # frame tag: keyframe (bit 0 clear)
        + b"\x9d\x01\x2a"
        + struct.pack("<HH", width, height)
        + b"\x00" * 16
    )
    return _webp(b"VP8 ", body)


def _vp8x(width: int, height: int) -> bytes:
    body = (
        b"\x00" * 4
        + (width - 1).to_bytes(3, "little")
        + (height - 1).to_bytes(3, "little")
    )
    return _webp(b"VP8X", body)


def test_webp_dims_all_three_flavors():
    assert webp_dims(_vp8l(1, 1)) == (1, 1)
    assert webp_dims(_vp8l(800, 601, alpha=1)) == (800, 601)
    assert webp_dims(_vp8l(16384, 16384)) == (16384, 16384)  # 14-bit max
    assert webp_dims(_vp8(640, 480)) == (640, 480)
    # the top 2 bits of the VP8 dims are the rescale hint — masked off
    assert webp_dims(_vp8(320 | 0x4000, 240 | 0x8000)) == (320, 240)
    assert webp_dims(_vp8x(1920, 1080)) == (1920, 1080)


def test_webp_dims_loud_gates():
    with pytest.raises(ValueError, match="RIFF/WEBP"):
        webp_dims(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(TypeError):
        webp_dims("not bytes")
    with pytest.raises(ValueError, match="signature"):
        bad = bytearray(_vp8l(8, 8))
        bad[20] = 0x30
        webp_dims(bytes(bad))
    with pytest.raises(ValueError, match="version"):
        webp_dims(_vp8l(8, 8, version=1))
    with pytest.raises(ValueError, match="start code"):
        bad = bytearray(_vp8(8, 8))
        bad[23] = 0x00
        webp_dims(bytes(bad))
    with pytest.raises(ValueError, match="interframe"):
        bad = bytearray(_vp8(8, 8))
        bad[20] |= 0x01
        webp_dims(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        webp_dims(_vp8l(8, 8)[:22])
    with pytest.raises(NotImplementedError, match="ALPH"):
        webp_dims(_webp(b"ALPH", b"\x00" * 16))


def test_decode_images_webp_metadata_face(spark):
    from etl_instagram_spark.multimodal.images import decode_images

    rows = [
        ("a", bytearray(_vp8l(48, 32)), "image", None),
        ("b", bytearray(_vp8(640, 480)), "image", None),
        ("c", bytearray(_vp8x(100, 50)), "image", None),
        ("n", None, "image", None),
    ]
    df = spark.createDataFrame(
        rows,
        "id string, content binary, media_type string, "
        "meta struct<width int, height int, format string>",
    )
    out = {r["id"]: r["meta"] for r in decode_images(df, decoder="webp").collect()}
    assert out["a"].asDict() == {"width": 48, "height": 32, "format": "webp"}
    assert out["b"].asDict() == {"width": 640, "height": 480, "format": "webp"}
    assert out["c"].asDict() == {"width": 100, "height": 50, "format": "webp"}
    assert out["n"] is None


# ---------------------------------------------------------------------------
# MP3
# ---------------------------------------------------------------------------

_BR_MPEG1_L3 = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_BR_MPEG2_L3 = (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
_BR_MPEG1_L1 = (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)


def _frame(version="1", layer=3, kbps=128, sr_idx=0, pad=0, mode=3):
    vbits = {"2.5": 0, "2": 2, "1": 3}[version]
    table = {
        ("1", 3): _BR_MPEG1_L3,
        ("1", 1): _BR_MPEG1_L1,
        ("2", 3): _BR_MPEG2_L3,
        ("2.5", 3): _BR_MPEG2_L3,
    }[(version, layer)]
    br_idx = table.index(kbps) + 1
    h = (
        (0x7FF << 21)
        | (vbits << 19)
        | ((4 - layer) << 17)
        | (1 << 16)  # no CRC
        | (br_idx << 12)
        | (sr_idx << 10)
        | (pad << 9)
        | (mode << 6)
    )
    sr = {"1": (44100, 48000, 32000), "2": (22050, 24000, 16000),
          "2.5": (11025, 12000, 8000)}[version][sr_idx]
    if layer == 1:
        n = (12 * kbps * 1000 // sr + pad) * 4
    elif layer == 3 and version != "1":
        n = 72 * kbps * 1000 // sr + pad
    else:
        n = 144 * kbps * 1000 // sr + pad
    return h.to_bytes(4, "big") + b"\x00" * (n - 4)


def test_mp3_info_cbr_stream():
    data = b"".join(_frame() for _ in range(10))
    d = mp3_info(data)
    assert (d["version"], d["layer"], d["sample_rate"], d["channels"]) == (
        "1", 3, 44100, 1,
    )
    assert d["n_frames"] == 10 and not d["vbr"]
    assert d["bitrate_kbps"] == 128.0
    # 10 x 1152 samples at 44100 Hz, ceil
    assert d["duration_ms"] == -(-10 * 1152 * 1000 // 44100)


def test_mp3_info_vbr_padding_tags_and_variants():
    # VBR with padding bits, an ID3v2 leader and an ID3v1 trailer
    frames = b"".join(
        _frame(kbps=(128 if i % 2 else 192), pad=i % 2) for i in range(6)
    )
    id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + b"\x00" * 20
    id3v1 = b"TAG" + b"\x00" * 125
    d = mp3_info(id3v2 + frames + id3v1)
    assert d["n_frames"] == 6 and d["vbr"]
    assert d["bitrate_kbps"] == 160.0
    # MPEG-2 Layer III: 576 samples/frame
    d2 = mp3_info(b"".join(_frame(version="2", kbps=64, sr_idx=1)
                           for _ in range(4)))
    assert (d2["version"], d2["sample_rate"]) == ("2", 24000)
    assert d2["duration_ms"] == -(-4 * 576 * 1000 // 24000)
    # Layer I frame-size formula (x4 slots), stereo mode
    d3 = mp3_info(b"".join(_frame(layer=1, kbps=224, mode=0)
                           for _ in range(3)))
    assert (d3["layer"], d3["channels"], d3["n_frames"]) == (1, 2, 3)


def test_mp3_info_loud_gates():
    with pytest.raises(TypeError):
        mp3_info("not bytes")
    with pytest.raises(ValueError, match="frame sync"):
        mp3_info(b"\x00\x01\x02\x03" * 40)
    with pytest.raises(ValueError, match="tags only"):
        mp3_info(b"TAG" + b"\x00" * 125)
    good = _frame()
    # free-format bitrate (index 0)
    free = bytearray(good)
    free[2] = (free[2] & 0x0F) | 0x00
    with pytest.raises(NotImplementedError, match="free-format"):
        mp3_info(bytes(free))
    # reserved version bits (01)
    rv = bytearray(good)
    rv[1] = (rv[1] & 0b11100111) | 0b00001000
    with pytest.raises(ValueError, match="reserved MPEG version"):
        mp3_info(bytes(rv))
    # truncated mid-frame
    with pytest.raises(ValueError, match="runs past"):
        mp3_info(good[: len(good) - 10])
    # properties change mid-stream
    with pytest.raises(ValueError, match="properties change"):
        mp3_info(good + _frame(sr_idx=1))
    # garbage after the last frame loses sync loudly
    with pytest.raises(ValueError, match="sync|truncated"):
        mp3_info(good + b"\x12\x34\x56\x78\x9a")
