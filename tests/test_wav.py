"""WAV/PCM decoder: differential against the stdlib ``wave`` module as
an INDEPENDENT encoder (it assembles its own RIFF headers — our parser
never sees code it wrote), chunk-slicing coverage, the loud
unsupported-format gates, and the Spark feature face with its near-dup
property across bit depths."""

from __future__ import annotations

import io
import math
import struct
import wave

import pytest

from etl_instagram_spark.multimodal.wav import (
    decode_wav,
    wav_feature_vector,
    wav_features,
    wav_info,
)


def _encode(samples, channels=1, rate=8000, sampwidth=2) -> bytes:
    """Independent encoder: stdlib wave writes the RIFF container.
    ``samples`` are CENTERED ints (the decode convention); 8-bit gets
    rebiased to unsigned here, wider widths packed signed LE."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        if sampwidth == 1:
            raw = bytes((s + 128) & 0xFF for s in samples)
        else:
            raw = b"".join(
                int(s).to_bytes(sampwidth, "little", signed=True)
                for s in samples
            )
        w.writeframes(raw)
    return buf.getvalue()


def _sine(n, freq, rate=8000, amp=12000):
    return [int(amp * math.sin(2 * math.pi * freq * i / rate)) for i in range(n)]


def test_decode_matches_stdlib_encoder_all_widths():
    src16 = _sine(400, 440)
    for sampwidth, scale in [(1, 1 / 256), (2, 1.0), (3, 256), (4, 65536)]:
        src = [int(s * scale) for s in src16]
        d = decode_wav(_encode(src, channels=1, rate=8000, sampwidth=sampwidth))
        assert d["sample_rate"] == 8000
        assert d["channels"] == 1
        assert d["bits"] == sampwidth * 8
        assert d["n_frames"] == 400
        assert d["samples"] == src, sampwidth
    # ceil duration: 400 frames at 8 kHz = exactly 50 ms
    assert decode_wav(_encode(src16))["duration_ms"] == 50
    # 401 frames → ceil(50.125) = 51
    assert decode_wav(_encode(src16 + [0]))["duration_ms"] == 51


def test_decode_stereo_interleaved():
    left = _sine(100, 440)
    right = _sine(100, 220)
    inter = [v for pair in zip(left, right) for v in pair]
    d = decode_wav(_encode(inter, channels=2, rate=16000, sampwidth=2))
    assert (d["channels"], d["n_frames"]) == (2, 100)
    assert d["samples"] == inter
    assert d["block_align"] == 4


def test_extensible_format_and_chunk_padding():
    """WAVE_FORMAT_EXTENSIBLE wrapping integer PCM decodes identically
    to the plain tag; an odd-sized chunk before fmt is skipped with its
    word-alignment pad byte."""
    src = _sine(64, 500)
    pcm = b"".join(int(s).to_bytes(2, "little", signed=True) for s in src)
    guid = struct.pack("<H", 1) + bytes(14)  # PCM sub-format GUID head
    fmt_ext = (
        struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
        + struct.pack("<HHI", 22, 16, 0x4)  # cbSize, valid bits, mask
        + guid
    )
    odd = b"abc"  # 3-byte chunk body → 1 pad byte follows
    body = (
        b"JUNK" + struct.pack("<I", len(odd)) + odd + b"\x00"
        + b"fmt " + struct.pack("<I", len(fmt_ext)) + fmt_ext
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    d = decode_wav(data)
    assert d["samples"] == src
    assert d["sample_rate"] == 8000


def test_unsupported_and_malformed_raise_loudly():
    good = _encode(_sine(64, 500))
    # ADPCM (tag 2) — still a loud gate
    i = good.index(b"fmt ")
    adpcm = good[: i + 8] + struct.pack("<H", 2) + good[i + 10 :]
    with pytest.raises(NotImplementedError, match="format tag 2"):
        decode_wav(adpcm)
    # IEEE float (tag 3) is supported ONLY at 32/64 bits: tag 3 over a
    # 16-bit body trips the float-width gate, not a silent mis-decode
    floaty16 = good[: i + 8] + struct.pack("<H", 3) + good[i + 10 :]
    with pytest.raises(NotImplementedError, match="float"):
        decode_wav(floaty16)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\xff\xd8\xff\xe0 not a wav")
    with pytest.raises(ValueError, match="truncated|missing"):
        decode_wav(good[: len(good) - 10])
    with pytest.raises(TypeError):
        decode_wav("not bytes")
    # block_align inconsistent with channels×width
    bad_block = good[: i + 20] + struct.pack("<H", 3) + good[i + 22 :]
    with pytest.raises(ValueError, match="block_align"):
        decode_wav(bad_block)


def test_chunk_audio_wav_covers_all_frames(spark):
    """decoder='wav' slices REAL PCM: without the cap, concatenating
    every chunk's bytes reproduces the whole data chunk byte-for-byte,
    boundaries are disjoint, and meta comes from the real header."""
    from etl_instagram_spark.multimodal.media import chunk_audio

    src = _sine(8000 * 3 + 123, 440)  # ~3.015 s mono 16-bit at 8 kHz
    data = _encode(src)
    info = wav_info(data)
    df = spark.createDataFrame(
        [("a", bytearray(data))], "id string, content binary"
    )
    rows = sorted(
        chunk_audio(df, chunk_ms=1000, max_chunks=1000, decoder="wav").collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert len(rows) == 4  # ceil(3016 ms / 1000)
    assert rows[0]["meta"]["sample_rate"] == 8000
    assert rows[0]["meta"]["duration_ms"] == info["duration_ms"]
    assert b"".join(bytes(r["samples"]) for r in rows) == info["pcm"]
    for prev, cur in zip(rows, rows[1:]):
        assert prev["end_ms"] == cur["start_ms"]
    # the fan-out cap still bounds output rows
    assert chunk_audio(df, chunk_ms=1000, max_chunks=2, decoder="wav").count() == 2


def test_wav_features_near_dup_across_bit_depths(spark):
    """The same recording encoded at 16-bit and 8-bit lands near cosine
    1 (quantization noise aside); a different recording does not; non-WAV
    content yields NULL, never a fabricated vector."""
    sig = _sine(2000, 440, amp=12000)
    blobs = [
        ("w16", bytearray(_encode(sig, sampwidth=2))),
        ("w8", bytearray(_encode([s // 256 for s in sig], sampwidth=1))),
        ("other", bytearray(_encode(_sine(2000, 1700, amp=6000), sampwidth=2))),
        ("junk", bytearray(b"\x89PNG pretend image")),
        ("null", None),
    ]
    df = spark.createDataFrame(blobs, "id string, content binary")
    out = {r["id"]: r["embedding"] for r in wav_features(df).collect()}
    assert out["junk"] is None and out["null"] is None

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        return num / den

    same = cos(out["w16"], out["w8"])
    diff = cos(out["w16"], out["other"])
    assert same > 0.999, same
    assert diff < same - 0.005, (same, diff)
    assert len(out["w16"]) == 16


def test_feature_vector_empty_and_determinism():
    assert wav_feature_vector(decode_wav(_encode([]))) is None
    d = decode_wav(_encode(_sine(500, 300)))
    assert wav_feature_vector(d) == wav_feature_vector(d)
    v = wav_feature_vector(d)
    assert v[0] == 1 / 8 and v[1] == 8000 / 48000  # channels, rate slots


# ---------------------------------------------------------------------------
# IEEE float PCM (tag 3, r15)
# ---------------------------------------------------------------------------


def _encode_float(samples, channels=1, rate=8000, width=4, tag_override=None):
    """Test-local float-WAV writer (stdlib wave cannot write tag 3):
    plain fmt chunk with tag 3, IEEE float32/float64 LE samples."""
    code = "<f" if width == 4 else "<d"
    pcm = b"".join(struct.pack(code, s) for s in samples)
    tag = 3 if tag_override is None else tag_override
    fmt = struct.pack(
        "<HHIIHH",
        tag,
        channels,
        rate,
        rate * channels * width,
        channels * width,
        width * 8,
    )
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_float32_and_float64_roundtrip():
    src = [math.sin(2 * math.pi * 440 * i / 8000) * 0.75 for i in range(256)]
    d32 = decode_wav(_encode_float(src, width=4))
    assert (d32["fmt"], d32["bits"], d32["n_frames"]) == ("float", 32, 256)
    # float32 quantizes the python doubles; compare against the packed
    # values themselves (exact roundtrip of what is stored)
    want32 = [struct.unpack("<f", struct.pack("<f", s))[0] for s in src]
    assert d32["samples"] == want32
    d64 = decode_wav(_encode_float(src, width=8))
    assert (d64["fmt"], d64["bits"]) == ("float", 64)
    assert d64["samples"] == src  # float64 stores the doubles exactly


def test_float_int_cross_format_near_dup():
    """The near-dup property across the int/float boundary: the same
    sine at int16 full-scale and float32 [-1, 1] land near cosine 1."""
    n = 512
    ints = _sine(n, 330, amp=24000)
    floats = [s / 32768.0 for s in ints]
    vi = wav_feature_vector(decode_wav(_encode(ints, sampwidth=2)))
    vf = wav_feature_vector(decode_wav(_encode_float(floats, width=4)))
    num = sum(a * b for a, b in zip(vi, vf))
    den = math.sqrt(sum(a * a for a in vi)) * math.sqrt(
        sum(b * b for b in vf)
    )
    assert num / den > 0.9999


def test_float_nonfinite_raises_loudly():
    src = [0.1, float("nan"), 0.2]
    with pytest.raises(ValueError, match="non-finite"):
        decode_wav(_encode_float(src, width=4))
    with pytest.raises(ValueError, match="non-finite"):
        decode_wav(_encode_float([float("inf")], width=8))


def test_float_extensible_wrapper():
    """WAVE_FORMAT_EXTENSIBLE wrapping IEEE float decodes identically
    to the plain tag-3 fmt chunk."""
    src = [math.sin(i / 7.0) * 0.5 for i in range(64)]
    pcm = b"".join(struct.pack("<f", s) for s in src)
    guid = struct.pack("<H", 3) + bytes(14)
    fmt_ext = (
        struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 32000, 4, 32)
        + struct.pack("<HHI", 22, 32, 0x4)
        + guid
    )
    body = (
        b"fmt " + struct.pack("<I", len(fmt_ext)) + fmt_ext
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    d = decode_wav(data)
    assert d["fmt"] == "float"
    assert d["samples"] == [
        struct.unpack("<f", struct.pack("<f", s))[0] for s in src
    ]
