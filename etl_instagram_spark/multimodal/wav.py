"""WAV/PCM decoding in pure stdlib — the audio sibling of the PNG
(multimodal/png.py) and baseline-JPEG (multimodal/jpeg.py) decoders:
RIFF container walk → ``fmt `` parse → ``data`` PCM frames, supporting
integer PCM at 8/16/24/32 bits and IEEE float PCM at 32/64 bits (tag
3, r15), mono or multi-channel, including the WAVE_FORMAT_EXTENSIBLE
wrapper around either. Everything else (ADPCM, mu-law/A-law, and every
compressed codec) raises ``NotImplementedError`` LOUDLY — the
honest-gate contract multimodal/media.py documents; nothing is
silently wrong.

Scope matches what a training-data pipeline actually needs from the
one audio container stdlib can fully handle: real sample access for
feature extraction (:func:`wav_features`), chunk slicing
(media.chunk_audio ``decoder='wav'``), and near-dup over decoded
content — completing decode → features → embedding-cosine dedup for a
second modality. The reference's only media handling moves opaque
bytes (labels.js:12-48); this is engine-native extension surface.

Format facts are from the public RIFF/WAVE specification (Microsoft/
IBM 1991 multimedia programming interface, the canonical WAVE chunk
layout): little-endian throughout, chunks word-aligned (odd-sized
chunk bodies are followed by one pad byte), 8-bit samples unsigned
biased at 128, wider samples signed two's-complement, channels
interleaved within a frame of ``block_align`` bytes.
"""

from __future__ import annotations

import struct

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

_PCM_BITS = (8, 16, 24, 32)


def wav_info(data: bytes) -> dict:
    """Header walk + raw PCM access (no per-sample parse): ``{sample_
    rate, channels, bits, block_align, n_frames, duration_ms, pcm}``
    with ``pcm`` the data chunk truncated to whole frames and
    ``duration_ms = ceil(n_frames·1000 / sample_rate)`` (ceil so a
    chunk grid over [0, duration_ms) always covers the final partial
    millisecond of frames). This is the cheap path chunking needs;
    :func:`decode_wav` adds parsed samples."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise TypeError(f"expected bytes, got {type(data).__name__}")
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (missing RIFF/WAVE header)")
    pos = 12
    fmt: tuple[int, int, int, int] | None = None
    pcm: bytes | None = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"wav: truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("wav: fmt chunk shorter than 16 bytes")
            tag, channels, rate, _byte_rate, block, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
                if size < 40:
                    raise ValueError("wav: truncated extensible fmt chunk")
                # the real format tag is the GUID's leading 2 bytes
                (tag,) = struct.unpack("<H", body[24:26])
            if tag not in (1, 3):
                raise NotImplementedError(
                    f"wav: format tag {tag} is not supported; integer PCM "
                    "(tag 1) and IEEE float PCM (tag 3) only — ADPCM and "
                    "mu-law/A-law stay loud gates like the compressed "
                    "codecs"
                )
            if tag == 1 and bits not in _PCM_BITS:
                raise NotImplementedError(
                    f"wav: {bits}-bit integer PCM not supported "
                    f"({_PCM_BITS} only)"
                )
            if tag == 3 and bits not in (32, 64):
                raise NotImplementedError(
                    f"wav: {bits}-bit IEEE float PCM not supported "
                    "(32 or 64 only)"
                )
            if channels < 1 or rate < 1:
                raise ValueError(
                    f"wav: implausible fmt (channels={channels}, rate={rate})"
                )
            if block != channels * (bits // 8):
                raise ValueError(
                    f"wav: block_align {block} != channels×width "
                    f"{channels * (bits // 8)}"
                )
            fmt = (channels, rate, bits, block, tag)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("wav: data chunk before fmt chunk")
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("wav: missing fmt or data chunk (truncated file?)")
    channels, rate, bits, block, tag = fmt
    n_frames = len(pcm) // block
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "block_align": block,
        "fmt": "float" if tag == 3 else "int",
        "n_frames": n_frames,
        "duration_ms": -(-n_frames * 1000 // rate),
        "pcm": pcm[: n_frames * block],
    }


def decode_wav(data: bytes) -> dict:
    """:func:`wav_info` plus ``samples``: for integer PCM the
    interleaved samples as CENTERED ints (8-bit unsigned rebased by
    −128; wider widths are already signed little-endian
    two's-complement), full scale ±2^(bits−1); for IEEE float PCM
    (``fmt == 'float'``) the raw float32/float64 samples, full scale
    ±1.0 by the WAVE float convention. Feature math reads the scale
    from ``fmt`` (:func:`wav_feature_vector`) and never branches on the
    storage width. Non-finite float samples (NaN/inf — spec-legal bytes
    but poison for every downstream statistic) raise loudly instead of
    propagating silently."""
    import math

    info = wav_info(data)
    pcm, bits = info["pcm"], info["bits"]
    if info["fmt"] == "float":
        width = bits // 8
        n = len(pcm) // width
        # one C-level unpack for the whole buffer — this sits in the
        # wav_features mapInPandas hot loop
        samples = list(
            struct.unpack(f"<{n}{'f' if bits == 32 else 'd'}", pcm)
        )
        if not all(map(math.isfinite, samples)):
            raise ValueError(
                "wav: non-finite IEEE float sample (NaN/inf) — refusing "
                "to feed it into feature statistics"
            )
    elif bits == 8:
        samples = [b - 128 for b in pcm]
    else:
        width = bits // 8
        samples = [
            int.from_bytes(pcm[o : o + width], "little", signed=True)
            for o in range(0, len(pcm), width)
        ]
    info["samples"] = samples
    return info


def wav_feature_vector(d: dict, n_segments: int = 8) -> list[float] | None:
    """Fixed 16-dim feature vector from a :func:`decode_wav` dict:
    [channels/8, rate/48k, log-length, DC mean, mean |x|, RMS, peak,
    zero-crossing rate, 8 segment RMS values] — sample statistics are
    over the CHANNEL-MEAN signal normalized by full scale (2^(bits−1)
    for integer PCM, 1.0 for IEEE float), so the same recording
    re-encoded at a different bit depth OR across the int/float
    boundary lands near cosine 1 (the near-dup property, quantization
    noise aside). None for an empty data chunk (callers filter)."""
    import numpy as np

    n, ch = d["n_frames"], d["channels"]
    if n == 0:
        return None
    full = 1.0 if d.get("fmt") == "float" else float(1 << (d["bits"] - 1))
    x = np.asarray(d["samples"], dtype=np.float64).reshape(n, ch)
    mono = x.mean(axis=1) / full
    crossings = int(np.sum(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    zcr = crossings / (n - 1) if n > 1 else 0.0
    seg_rms = []
    for i in range(n_segments):
        seg = mono[i * n // n_segments : (i + 1) * n // n_segments]
        seg_rms.append(float(np.sqrt(np.mean(seg * seg))) if seg.size else 0.0)
    out = [
        d["channels"] / 8.0,
        d["sample_rate"] / 48_000.0,
        min(1.0, float(np.log1p(n)) / float(np.log(2.0**32))),
        float(mono.mean()),
        float(np.abs(mono).mean()),
        float(np.sqrt(np.mean(mono * mono))),
        float(np.abs(mono).max()),
        zcr,
        *seg_rms,
    ]
    return [float(v) for v in out]


def wav_features(
    blobs: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """REAL content-based audio features from DECODED samples — the
    audio twin of images.pixel_features: (id, embedding array<float>)
    with the 16-dim :func:`wav_feature_vector` per blob. Non-WAV or
    undecodable content yields a NULL embedding (callers filter),
    never a fabricated vector. Output plugs straight into
    operators/similarity.py → decode → features → embedding-cosine
    dedup, the second real modality after images. Arrow-batched
    mapInPandas; embarrassingly parallel, one batch of blobs in
    memory at a time."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def feats(b):
            if b is None:
                return None
            raw = bytes(b)
            if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
                return None
            try:
                return wav_feature_vector(decode_wav(raw))
            except (ValueError, NotImplementedError):
                return None

        for pdf in batches:
            yield pd.DataFrame(
                {"id": pdf[id_col], "embedding": pdf[content_col].map(feats)}
            )

    return blobs.mapInPandas(run, schema="id string, embedding array<float>")
