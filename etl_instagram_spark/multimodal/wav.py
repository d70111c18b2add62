"""WAV/PCM decoding in pure stdlib — the audio sibling of the PNG
(multimodal/png.py) and baseline-JPEG (multimodal/jpeg.py) decoders:
RIFF container walk → ``fmt `` parse → ``data`` PCM frames, supporting
integer PCM at 8/16/24/32 bits, IEEE float PCM at 32/64 bits (tag 3,
r15), G.711 mu-law/A-law telephony PCM (tags 7/6, r16), IMA/DVI
ADPCM (tag 0x11, r16), and MS ADPCM (tag 2, r17), mono or
multi-channel, including the WAVE_FORMAT_EXTENSIBLE wrapper (except
MS-ADPCM-under-EXTENSIBLE, whose coefficient-table offset the plain
layout does not define). Everything else (every genuinely-compressed
codec — MP3/AAC/...) raises ``NotImplementedError`` LOUDLY — the
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
interleaved within a frame of ``block_align`` bytes. The G.711
mu-law/A-law segmented-companding expansion is the public ITU-T G.711
algorithm (the classic published integer formulation: invert/XOR the
byte, rebuild mantissa+bias, shift by the segment — max magnitudes
32124/32256 into the 16-bit linear domain); IMA ADPCM is the public
IMA/DVI 4-bit algorithm (per-block per-channel 4-byte state header
whose predictor IS sample 0, interleaved 4-byte nibble words low
nibble first, the 89-entry step table with shift-approximated
``diff = step>>3 (+step>>2)(+step>>1)(+step)`` and the 8-entry index
table) — every block decodes independently, which is exactly what
makes the format chunk-sliceable at scale. MS ADPCM (r17) is the
public Microsoft multimedia spec's linear predictor: per-block
per-channel 7-byte header (predictor-index byte into the mandated
7-standard-pair coefficient table, int16 idelta/sample1/sample2 —
sample2 emitted first), nibbles high-first interleaved per sample,
pred = trunc((s1·c1 + s2·c2)/256), step adaptation via the 16-entry
table with a floor of 16 — all C truncate-toward-zero integer
arithmetic; blocks likewise decode independently.
"""

from __future__ import annotations

import struct

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

_PCM_BITS = (8, 16, 24, 32)


def _ulaw_expand_one(b: int) -> int:
    """ITU-T G.711 mu-law byte → 16-bit linear (classic published
    integer form; max magnitude 32124)."""
    u = ~b & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def _alaw_expand_one(b: int) -> int:
    """ITU-T G.711 A-law byte → 16-bit linear (even-bit XOR 0x55
    convention; max magnitude 32256)."""
    a = b ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


_ULAW_TABLE = tuple(_ulaw_expand_one(b) for b in range(256))
_ALAW_TABLE = tuple(_alaw_expand_one(b) for b in range(256))

# IMA/DVI ADPCM tables (public IMA spec)
_IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8)
_IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767,
)

# MS ADPCM (WAVE_FORMAT_ADPCM, tag 2) tables — public Microsoft
# multimedia spec (the canonical MSADPCM reference): the 16-entry delta
# adaptation table indexed by the UNSIGNED nibble, and the 7 standard
# predictor coefficient pairs every encoder must carry first (files may
# append custom pairs; the per-block predictor byte indexes this table)
_MS_ADAPT = (
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
)
_MS_STD_COEFS = (
    (256, 0), (512, -256), (0, 0), (192, 64),
    (240, 0), (460, -208), (392, -232),
)


def _trunc_div_256(x: int) -> int:
    """C integer division by 256 (truncate toward zero) — the MS ADPCM
    reference arithmetic (``/ PSCALE`` on C ints); Python ``//`` floors,
    which diverges on negative non-multiples."""
    return -((-x) >> 8) if x < 0 else x >> 8


# formats whose decoded samples live in the 16-bit linear domain
# regardless of the stored width (companded/compressed storage)
_EXPANDED_FMTS = ("ulaw", "alaw", "ima_adpcm", "ms_adpcm")


_FMT_NAMES = {
    1: "int",
    2: "ms_adpcm",
    3: "float",
    6: "alaw",
    7: "ulaw",
    0x11: "ima_adpcm",
}


def wav_info(data: bytes) -> dict:
    """Header walk + raw PCM access (no per-sample parse): ``{sample_
    rate, channels, bits, block_align, fmt, n_frames, duration_ms,
    pcm}`` with ``pcm`` the data chunk truncated to whole frames and
    ``duration_ms = ceil(n_frames·1000 / sample_rate)`` (ceil so a
    chunk grid over [0, duration_ms) always covers the final partial
    millisecond of frames). This is the cheap path chunking needs;
    :func:`decode_wav` adds parsed samples.

    ``fmt`` ∈ int/float/ulaw/alaw/ima_adpcm. For G.711 (ulaw/alaw) a
    frame is one companded byte per channel, so the frame grid works
    exactly like integer PCM. For IMA ADPCM ``block_align`` is the raw
    COMPRESSED block size, ``samples_per_block`` is added (from the
    fmt extension's wSamplesPerBlock — the same offset carries it
    under the EXTENSIBLE wrapper, per spec), ``n_frames`` counts
    DECODED sample frames (the ``fact`` chunk's dwSampleLength when
    present and smaller — the spec's authoritative count for non-PCM —
    else computed from whole nibble-word groups), and ``pcm`` is the
    raw block stream (every block decodes independently)."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise TypeError(f"expected bytes, got {type(data).__name__}")
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (missing RIFF/WAVE header)")
    pos = 12
    fmt: tuple[int, int, int, int, int, int | None] | None = None
    pcm: bytes | None = None
    fact_frames: int | None = None
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
            was_extensible = tag == 0xFFFE
            if was_extensible:  # WAVE_FORMAT_EXTENSIBLE
                if size < 40:
                    raise ValueError("wav: truncated extensible fmt chunk")
                # the real format tag is the GUID's leading 2 bytes
                (tag,) = struct.unpack("<H", body[24:26])
            if tag not in _FMT_NAMES:
                raise NotImplementedError(
                    f"wav: format tag {tag} is not supported; integer PCM "
                    "(tag 1), MS ADPCM (tag 2), IEEE float PCM (tag 3), "
                    "G.711 mu-law/A-law (tags 7/6), and IMA ADPCM "
                    "(tag 0x11) only — the compressed codecs stay loud "
                    "gates"
                )
            if tag == 2 and was_extensible:
                raise NotImplementedError(
                    "wav: MS ADPCM under the EXTENSIBLE wrapper is not "
                    "supported — the coefficient table's offset is not "
                    "defined by the plain-fmt layout this parser reads"
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
            if tag in (6, 7) and bits != 8:
                raise ValueError(
                    f"wav: G.711 requires 8-bit storage, got {bits}"
                )
            if tag == 0x11 and bits != 4:
                raise NotImplementedError(
                    f"wav: {bits}-bit IMA ADPCM not supported (4 only)"
                )
            if tag == 2 and bits != 4:
                raise NotImplementedError(
                    f"wav: {bits}-bit MS ADPCM not supported (4 only)"
                )
            if channels < 1 or rate < 1:
                raise ValueError(
                    f"wav: implausible fmt (channels={channels}, rate={rate})"
                )
            spb: int | None = None
            coefs: tuple[tuple[int, int], ...] | None = None
            if tag == 2:
                # block layout: 1-byte predictor index per channel, then
                # int16 idelta/sample1/sample2 per channel (7 bytes/ch of
                # header), then 4-bit nibbles high-first, channels
                # interleaved per sample
                if size < 22:
                    raise ValueError(
                        "wav: MS ADPCM fmt chunk missing "
                        "wSamplesPerBlock/wNumCoef"
                    )
                spb, ncoef = struct.unpack("<HH", body[18:22])
                if ncoef < 1 or size < 22 + 4 * ncoef:
                    raise ValueError(
                        f"wav: MS ADPCM fmt chunk truncated before its "
                        f"{ncoef} coefficient pairs"
                    )
                coefs = tuple(
                    struct.unpack("<hh", body[22 + 4 * i : 26 + 4 * i])
                    for i in range(ncoef)
                )
                if coefs[: len(_MS_STD_COEFS)] != _MS_STD_COEFS[: len(coefs)]:
                    raise ValueError(
                        "wav: MS ADPCM coefficient table does not begin "
                        "with the 7 standard pairs the spec mandates"
                    )
                if block <= 7 * channels or (block - 7 * channels) * 2 % channels:
                    raise ValueError(
                        f"wav: MS ADPCM block_align {block} is not "
                        f"7·ch header + whole nibbles per channel "
                        f"(channels={channels})"
                    )
                expect = (block - 7 * channels) * 2 // channels + 2
                if spb != expect:
                    raise ValueError(
                        f"wav: MS ADPCM samples_per_block {spb} != "
                        f"{expect} implied by block_align {block}"
                    )
            elif tag == 0x11:
                # block layout: 4-byte state header per channel, then
                # interleaved 4-byte nibble words per channel
                if size < 20:
                    raise ValueError(
                        "wav: IMA ADPCM fmt chunk missing wSamplesPerBlock"
                    )
                (spb,) = struct.unpack("<H", body[18:20])
                if block <= 4 * channels or (block - 4 * channels) % (
                    4 * channels
                ):
                    raise ValueError(
                        f"wav: IMA ADPCM block_align {block} is not "
                        f"4·ch header + k·4·ch data (channels={channels})"
                    )
                # a full block decodes 1 header sample + 8 per nibble-word
                # group = an ODD count; some real-world encoders write
                # wSamplesPerBlock without the +1 (even spb) — accept
                # {expect, expect-1} (r17, ADVICE): the even form simply
                # trims the final nibble of every block
                # (_ima_decode_block's ch[:spb])
                expect = (block - 4 * channels) * 2 // channels + 1
                if spb not in (expect, expect - 1):
                    raise ValueError(
                        f"wav: IMA ADPCM samples_per_block {spb} not in "
                        f"{{{expect}, {expect - 1}}} implied by "
                        f"block_align {block}"
                    )
            elif block != channels * (bits // 8):
                raise ValueError(
                    f"wav: block_align {block} != channels×width "
                    f"{channels * (bits // 8)}"
                )
            fmt = (channels, rate, bits, block, tag, spb, coefs)
        elif cid == b"fact" and size >= 4:
            (fact_frames,) = struct.unpack("<I", body[:4])
        elif cid == b"data":
            if fmt is None:
                raise ValueError("wav: data chunk before fmt chunk")
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("wav: missing fmt or data chunk (truncated file?)")
    channels, rate, bits, block, tag, spb, coefs = fmt
    if tag == 0x11:
        assert spb is not None
        full_blocks, rem = divmod(len(pcm), block)
        n_frames = full_blocks * spb
        if rem >= 4 * channels:
            # decodable tail: header sample + 8 per whole nibble-word group
            n_frames += 1 + (rem - 4 * channels) // (4 * channels) * 8
        if fact_frames is not None:
            n_frames = min(n_frames, fact_frames)
        keep = pcm  # raw block stream; decode bounds by n_frames
    elif tag == 2:
        assert spb is not None
        full_blocks, rem = divmod(len(pcm), block)
        n_frames = full_blocks * spb
        if rem >= 7 * channels:
            # decodable tail: the 2 header samples + 2 nibbles per data
            # byte spread across the channels
            n_frames += min(spb, 2 + (rem - 7 * channels) * 2 // channels)
        if fact_frames is not None:
            n_frames = min(n_frames, fact_frames)
        keep = pcm  # raw block stream; decode bounds by n_frames
    else:
        n_frames = len(pcm) // block
        if fact_frames is not None and tag != 1:
            n_frames = min(n_frames, fact_frames)
        keep = pcm[: n_frames * block]
    out = {
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "block_align": block,
        "fmt": _FMT_NAMES[tag],
        "n_frames": n_frames,
        "duration_ms": -(-n_frames * 1000 // rate),
        "pcm": keep,
    }
    if spb is not None:
        out["samples_per_block"] = spb
    if coefs is not None:
        out["ms_coefs"] = coefs
    return out


def _ima_decode_block(
    block: bytes, channels: int, spb: int
) -> list[list[int]]:
    """Decode one IMA ADPCM block → per-channel 16-bit linear sample
    lists (≤ ``spb`` each; a truncated tail block yields fewer). The
    4-byte per-channel header carries (predictor int16, step index,
    reserved); the header predictor IS sample 0 per the IMA spec. Data
    is interleaved 4-byte words per channel, 8 nibbles each, low
    nibble first."""
    out: list[list[int]] = []
    idxs: list[int] = []
    for c in range(channels):
        hdr = block[c * 4 : c * 4 + 4]
        if len(hdr) < 4:
            return [[] for _ in range(channels)]
        pred = int.from_bytes(hdr[:2], "little", signed=True)
        idx = hdr[2]
        if idx > 88:
            raise ValueError(f"wav: IMA ADPCM step index {idx} > 88")
        out.append([pred])
        idxs.append(idx)
    data = block[4 * channels :]
    group = 4 * channels
    pos = 0
    while pos + group <= len(data) and len(out[0]) < spb:
        for c in range(channels):
            word = data[pos + c * 4 : pos + c * 4 + 4]
            pred, idx, samples = out[c][-1], idxs[c], out[c]
            for byte in word:
                for nib in (byte & 0x0F, byte >> 4):
                    step = _IMA_STEPS[idx]
                    diff = step >> 3
                    if nib & 1:
                        diff += step >> 2
                    if nib & 2:
                        diff += step >> 1
                    if nib & 4:
                        diff += step
                    if nib & 8:
                        pred -= diff
                    else:
                        pred += diff
                    pred = max(-32768, min(32767, pred))
                    idx = max(0, min(88, idx + _IMA_INDEX[nib & 7]))
                    samples.append(pred)
            idxs[c] = idx
        pos += group
    # per-channel trim to spb: with the even-spb header form (r17 —
    # wSamplesPerBlock written without the +1) a full block's 8-nibble
    # words decode one sample past spb and the trim drops it
    return [ch[:spb] for ch in out]


def _ms_decode_block(
    block: bytes,
    channels: int,
    spb: int,
    coefs: tuple[tuple[int, int], ...],
) -> list[list[int]]:
    """Decode one MS ADPCM block → per-channel 16-bit linear sample
    lists (≤ ``spb`` each; a truncated tail block yields fewer). Header
    per the public spec: one predictor-index byte per channel, then
    int16 idelta / sample1 / sample2 per channel; sample2 (the older)
    is emitted first, then sample1, then one sample per nibble —
    nibbles high-first within a byte, channels interleaved per sample.
    Per sample: pred = trunc((s1·c1 + s2·c2)/256), new = clamp16(pred +
    delta·signed_nibble), delta = max(16, trunc(adapt[nibble]·delta/
    256)) — all C truncate-toward-zero arithmetic
    (:func:`_trunc_div_256`)."""
    hdr_len = 7 * channels
    if len(block) < hdr_len:
        return [[] for _ in range(channels)]
    c1 = [0] * channels
    c2 = [0] * channels
    for c in range(channels):
        p = block[c]
        if p >= len(coefs):
            raise ValueError(
                f"wav: MS ADPCM predictor index {p} >= "
                f"{len(coefs)} coefficient pairs"
            )
        c1[c], c2[c] = coefs[p]
    # clamp the header idelta on read to the same >= 16 floor the
    # adaptation step maintains: a crafted/malformed idelta <= 0 would
    # otherwise invert the first error term per channel before the
    # max(16, ...) kicks in (every spec-conformant encoder emits
    # idelta >= 16, so valid streams are untouched)
    deltas = [
        max(
            16,
            int.from_bytes(
                block[channels + 2 * c : channels + 2 * c + 2],
                "little",
                signed=True,
            ),
        )
        for c in range(channels)
    ]
    o1 = 3 * channels
    s1 = [
        int.from_bytes(block[o1 + 2 * c : o1 + 2 * c + 2], "little", signed=True)
        for c in range(channels)
    ]
    o2 = 5 * channels
    s2 = [
        int.from_bytes(block[o2 + 2 * c : o2 + 2 * c + 2], "little", signed=True)
        for c in range(channels)
    ]
    out = [[s2[c], s1[c]] for c in range(channels)]
    ci = 0
    for byte in block[hdr_len:]:
        for nib in (byte >> 4, byte & 0x0F):
            c = ci % channels
            ci += 1
            if len(out[c]) >= spb:
                continue  # trailing pad nibbles past the block's count
            pred = _trunc_div_256(s1[c] * c1[c] + s2[c] * c2[c])
            snib = nib - 16 if nib & 8 else nib
            samp = max(-32768, min(32767, pred + deltas[c] * snib))
            s2[c], s1[c] = s1[c], samp
            deltas[c] = max(16, _trunc_div_256(_MS_ADAPT[nib] * deltas[c]))
            out[c].append(samp)
    return out


def decode_wav(data: bytes) -> dict:
    """:func:`wav_info` plus ``samples``: for integer PCM the
    interleaved samples as CENTERED ints (8-bit unsigned rebased by
    −128; wider widths are already signed little-endian
    two's-complement), full scale ±2^(bits−1); for IEEE float PCM
    (``fmt == 'float'``) the raw float32/float64 samples, full scale
    ±1.0 by the WAVE float convention; for G.711 mu-law/A-law and the
    ADPCM families (``fmt`` ∈ ulaw/alaw/ima_adpcm/ms_adpcm) the
    EXPANDED 16-bit linear samples, full scale ±2^15 regardless of the
    stored width. Feature
    math reads the scale from ``fmt`` (:func:`wav_feature_vector`) and
    never branches on the storage width. Non-finite float samples
    (NaN/inf — spec-legal bytes but poison for every downstream
    statistic) raise loudly instead of propagating silently."""
    import math

    info = wav_info(data)
    pcm, bits = info["pcm"], info["bits"]
    fmt = info["fmt"]
    if fmt == "float":
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
    elif fmt == "ulaw":
        samples = [_ULAW_TABLE[b] for b in pcm]
    elif fmt == "alaw":
        samples = [_ALAW_TABLE[b] for b in pcm]
    elif fmt in ("ima_adpcm", "ms_adpcm"):
        ch, block, spb = (
            info["channels"],
            info["block_align"],
            info["samples_per_block"],
        )
        n_frames = info["n_frames"]
        samples = []
        done = 0
        for off in range(0, len(pcm), block):
            if fmt == "ms_adpcm":
                chans = _ms_decode_block(
                    pcm[off : off + block], ch, spb, info["ms_coefs"]
                )
            else:
                chans = _ima_decode_block(pcm[off : off + block], ch, spb)
            take = min(len(chans[0]), n_frames - done)
            for i in range(take):  # interleave back to frame order
                for c in range(ch):
                    samples.append(chans[c][i])
            done += take
            if done >= n_frames:
                break
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


def decode_wav_np(data: bytes) -> dict:
    """:func:`decode_wav` with ``samples`` as a numpy array instead of
    a Python list — the :func:`wav_features` hot path (r16): integer
    PCM via ``np.frombuffer`` views, G.711 via one vectorized table
    take, float PCM via a dtype view with a vectorized finiteness
    check. Values are IDENTICAL to :func:`decode_wav`'s (pinned by
    test); IMA ADPCM keeps the sequential block decode (true data
    dependence through the predictor) and converts once."""
    import numpy as np

    info = wav_info(data)
    pcm, bits, fmt = info["pcm"], info["bits"], info["fmt"]
    if fmt == "float":
        arr = np.frombuffer(pcm, dtype="<f4" if bits == 32 else "<f8")
        if not np.isfinite(arr).all():
            raise ValueError(
                "wav: non-finite IEEE float sample (NaN/inf) — refusing "
                "to feed it into feature statistics"
            )
    elif fmt == "ulaw":
        arr = np.asarray(_ULAW_TABLE, dtype=np.int32)[
            np.frombuffer(pcm, dtype=np.uint8)
        ]
    elif fmt == "alaw":
        arr = np.asarray(_ALAW_TABLE, dtype=np.int32)[
            np.frombuffer(pcm, dtype=np.uint8)
        ]
    elif fmt in ("ima_adpcm", "ms_adpcm"):
        d = decode_wav(data)
        d["samples"] = np.asarray(d["samples"], dtype=np.int32)
        return d
    elif bits == 8:
        arr = np.frombuffer(pcm, dtype=np.uint8).astype(np.int32) - 128
    elif bits == 16:
        arr = np.frombuffer(pcm, dtype="<i2")
    elif bits == 32:
        arr = np.frombuffer(pcm, dtype="<i4")
    else:  # 24-bit: sign-extend three little-endian bytes
        b = np.frombuffer(pcm, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        arr = b[:, 0] | (b[:, 1] << 8) | ((b[:, 2].astype(np.int8).astype(np.int32)) << 16)
    info["samples"] = arr
    return info


def wav_feature_vector(d: dict, n_segments: int = 8) -> list[float] | None:
    """Fixed 16-dim feature vector from a :func:`decode_wav` dict:
    [channels/8, rate/48k, log-length, DC mean, mean |x|, RMS, peak,
    zero-crossing rate, 8 segment RMS values] — sample statistics are
    over the CHANNEL-MEAN signal normalized by full scale (2^(bits−1)
    for integer PCM, 1.0 for IEEE float, 2^15 for the expanded
    G.711/ADPCM formats whose decoded samples are 16-bit linear), so
    the same recording re-encoded at a different bit depth OR across
    the int/float/companded boundary lands near cosine 1 (the near-dup
    property, quantization noise aside). None for an empty data chunk
    (callers filter)."""
    import numpy as np

    n, ch = d["n_frames"], d["channels"]
    if n == 0:
        return None
    fmt = d.get("fmt")
    if fmt == "float":
        full = 1.0
    elif fmt in _EXPANDED_FMTS:
        full = float(1 << 15)
    else:
        full = float(1 << (d["bits"] - 1))
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
                # numpy sample decode (value-identical, pinned by test)
                # — the per-sample Python loop was this stage's floor
                return wav_feature_vector(decode_wav_np(raw))
            except (ValueError, NotImplementedError):
                return None

        for pdf in batches:
            yield pd.DataFrame(
                {"id": pdf[id_col], "embedding": pdf[content_col].map(feats)}
            )

    return blobs.mapInPandas(run, schema="id string, embedding array<float>")
