"""MJPEG-in-AVI video parsing in pure stdlib — the third REAL modality
path (PNG/JPEG images r12/r14, WAV audio r15): AVI is a RIFF container
(the same chunk grammar as multimodal/wav.py, word-aligned chunks and
LIST nesting per the public Microsoft RIFF/AVI specification), and a
Motion-JPEG stream's frames are baseline JPEGs — which
multimodal/jpeg.py already decodes. So frame SAMPLING (the operation
media.sample_frames needs) is a container walk: read ``avih`` for
timing/dims, collect the ``movi`` list's video chunks, pick the frame
under each sample tick. No codec math here at all; pixels come from
decode_jpeg only where a consumer wants them.

r18: AUDIO-MUXED files — the common real-world AVI — are demuxed, not
gated: the ``hdrl`` list's per-stream ``strl`` headers (``strh``
fccType ``vids``/``auds`` + ``strf`` format block) type each stream,
movi chunks route by their two-digit stream prefix (``NNdc``/``NNdb``
video, ``NNwb`` audio), and each audio stream comes back as its
verbatim WAVEFORMATEX ``strf`` plus concatenated payload.
:func:`avi_audio_wav` re-wraps that pair as a RIFF/WAVE blob — the
``strf`` block IS the WAV ``fmt`` chunk body — so multimodal/wav.py's
whole codec surface (integer/float PCM, G.711, IMA/MS ADPCM) applies
to AVI audio tracks with zero new codec code.

Honest-gate scope (the png/jpeg/wav contract): exactly one video
stream ('##dc' compressed / '##db' uncompressed-DIB chunks, each a
whole baseline JPEG when frames are actually decoded), any number of
audio streams, nothing else — multiple video streams, non-vids/auds
stream types (txts/mids/…), AVIX/OpenDML continuation segments, and a
multi-stream file missing its ``strl`` headers raise loudly, never
silently wrong. The reference never decodes media (labels.js:12-48
moves bytes); this is engine-native extension surface.
"""

from __future__ import annotations

import struct

_VIDEO_CHUNK_SUFFIXES = (b"dc", b"db")
_AUDIO_CHUNK_SUFFIX = b"wb"


def parse_avi(data: bytes) -> dict:
    """Container walk → ``{width, height, n_frames,
    microsec_per_frame, duration_ms, frames, audio_streams}`` with
    ``frames`` the list of raw video-chunk payloads (one bytes object
    per stored frame, in stream order) and ``audio_streams`` a list of
    ``{format_tag, channels, sample_rate, bits_per_sample,
    block_align, strf, data}`` — one entry per ``auds`` stream, data =
    the concatenated movi payloads (feed :func:`avi_audio_wav` to get
    a decodable WAV blob). ``n_frames`` is the count of stored video
    frames actually found (``avih``'s dwTotalFrames is advisory and
    cross-checked only when nonzero). Raises ``ValueError`` on
    malformed containers and ``NotImplementedError`` on genuinely
    unsupported shapes (multiple video streams, non-vids/auds stream
    types, AVIX segments) — loudly, never silently wrong."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise TypeError(f"expected bytes, got {type(data).__name__}")
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI header)")

    avih: dict | None = None
    strls: list[dict] = []  # per-stream headers, strl order = stream id
    # movi payloads routed by two-digit stream prefix: id -> kind -> [..]
    chunks: dict[int, dict[str, list[bytes]]] = {}

    def walk(pos: int, end: int, ltype: bytes = b"") -> None:
        nonlocal avih
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_start = pos + 8
            if body_start + size > end:
                raise ValueError(f"avi: truncated {cid!r} chunk")
            if cid == b"RIFF":
                # an OpenDML/AVIX continuation segment ('RIFF…AVIX'
                # after the first RIFF, standard for >~1 GB files):
                # its frames are NOT in the legacy segment and avih's
                # dwTotalFrames conventionally counts only the first
                # segment, so skipping it would return a silently
                # truncated frame set — the one outcome the honest-gate
                # contract forbids
                raise NotImplementedError(
                    "avi: OpenDML/AVIX multi-segment files not supported "
                    "(the continuation RIFF segment's frames would be "
                    "silently dropped) — single-RIFF MJPEG AVIs only"
                )
            if cid == b"LIST":
                sub = data[body_start : body_start + 4]
                if sub == b"strl":
                    strls.append({})
                walk(body_start + 4, body_start + size, sub)
            elif cid == b"avih":
                if size < 40:
                    raise ValueError("avi: avih chunk shorter than 40 bytes")
                (mspf, _maxrate, _pad, _flags, total, _init, streams, _buf,
                 width, height) = struct.unpack(
                    "<10I", data[body_start : body_start + 40]
                )
                if mspf == 0 or width == 0 or height == 0:
                    raise ValueError(
                        "avi: implausible avih (zero frame period or dims)"
                    )
                avih = {
                    "microsec_per_frame": mspf,
                    "total_frames": total,
                    "streams": streams,
                    "width": width,
                    "height": height,
                }
            elif cid == b"strh" and ltype == b"strl":
                if size < 8:
                    raise ValueError("avi: truncated strh chunk")
                strls[-1]["type"] = data[body_start : body_start + 4]
                strls[-1]["handler"] = data[body_start + 4 : body_start + 8]
            elif cid == b"strf" and ltype == b"strl":
                strls[-1]["strf"] = data[body_start : body_start + size]
            elif (
                cid[:2].isdigit()
                and (
                    cid[2:4] in _VIDEO_CHUNK_SUFFIXES
                    or cid[2:4] == _AUDIO_CHUNK_SUFFIX
                )
            ):
                sid = int(cid[:2])
                kind = "a" if cid[2:4] == _AUDIO_CHUNK_SUFFIX else "v"
                chunks.setdefault(sid, {}).setdefault(kind, []).append(
                    data[body_start : body_start + size]
                )
            pos = body_start + size + (size & 1)  # word-aligned

    walk(12, len(data))
    if avih is None:
        raise ValueError("avi: missing avih header (truncated file?)")

    audio_streams: list[dict] = []
    if strls:
        if len(strls) != avih["streams"]:
            raise ValueError(
                f"avi: avih declares {avih['streams']} streams but hdrl "
                f"holds {len(strls)} strl list(s)"
            )
        for i, s in enumerate(strls):
            if "type" not in s:
                raise ValueError(f"avi: strl #{i} missing its strh chunk")
            if s["type"] not in (b"vids", b"auds"):
                raise NotImplementedError(
                    f"avi: stream #{i} type {s['type']!r} not supported "
                    "(vids + auds only — txts/mids/other streams stay a "
                    "loud gate)"
                )
        vids = [i for i, s in enumerate(strls) if s["type"] == b"vids"]
        if not vids:
            raise ValueError("avi: no video stream declared in hdrl")
        if len(vids) > 1:
            raise NotImplementedError(
                f"avi: {len(vids)} video streams not supported (one video "
                "stream only; pick-a-stream demux stays a loud gate)"
            )
        frames = chunks.get(vids[0], {}).get("v", [])
        for i, s in enumerate(strls):
            if s["type"] != b"auds":
                continue
            strf = s.get("strf", b"")
            if len(strf) < 16:
                raise ValueError(
                    f"avi: audio stream #{i} strf shorter than the "
                    "16-byte WAVEFORMAT header"
                )
            tag, ch, rate, _avg, ba = struct.unpack("<HHIIH", strf[:14])
            bits = struct.unpack("<H", strf[14:16])[0]
            audio_streams.append(
                {
                    "format_tag": tag,
                    "channels": ch,
                    "sample_rate": rate,
                    "bits_per_sample": bits,
                    "block_align": ba,
                    "strf": strf,
                    "data": b"".join(chunks.get(i, {}).get("a", [])),
                }
            )
    else:
        # legacy header-less-strl files (and minimal writers): only
        # unambiguous for a single stream — demuxing a multi-stream
        # movi needs the strl types
        if avih["streams"] != 1:
            raise ValueError(
                f"avi: avih declares {avih['streams']} streams but hdrl "
                "carries no strl headers to type them"
            )
        frames = [
            p
            for sid in sorted(chunks)
            for p in chunks[sid].get("v", [])
        ]

    if not frames:
        raise ValueError("avi: no video frame chunks found")
    if avih["total_frames"] and avih["total_frames"] != len(frames):
        raise ValueError(
            f"avi: avih declares {avih['total_frames']} frames but the "
            f"movi list holds {len(frames)}"
        )
    n = len(frames)
    mspf = avih["microsec_per_frame"]
    return {
        "width": avih["width"],
        "height": avih["height"],
        "n_frames": n,
        "microsec_per_frame": mspf,
        # ceil, the wav_info convention: a sample grid over
        # [0, duration_ms) always reaches the final frame
        "duration_ms": -(-n * mspf // 1000),
        "frames": frames,
        "audio_streams": audio_streams,
    }


def avi_audio_wav(parsed: dict, stream: int = 0) -> bytes:
    """Re-wrap one demuxed AVI audio stream as a RIFF/WAVE blob: the
    ``strf`` block is byte-for-byte the WAV ``fmt `` chunk body
    (WAVEFORMATEX is shared between the two containers), the
    concatenated movi payloads are the ``data`` chunk — so
    ``decode_wav``/``wav_features``/``chunk_audio(decoder='wav')``
    consume AVI audio tracks through the existing codec surface
    (integer/float PCM, G.711, IMA/MS ADPCM) with their own loud gates
    for anything else (MP3-in-AVI etc. raises from wav.py's format
    check, naming the tag)."""
    streams = parsed.get("audio_streams") or []
    if stream < 0 or stream >= len(streams):
        raise ValueError(
            f"avi: no audio stream #{stream} (file has {len(streams)})"
        )
    a = streams[stream]
    fmt, payload = a["strf"], a["data"]
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if len(fmt) & 1:
        body += b"\x00"
    body += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def sample_frame_indices(
    n_frames: int, microsec_per_frame: int, every_ms: int, max_frames: int
) -> list[tuple[int, int]]:
    """(frame_idx, ts_ms) pairs for sample ticks at 0, every_ms,
    2·every_ms, … — frame_idx = the frame showing at that instant
    (floor(t/frame_period)), deduped (a tick landing on an already-
    sampled frame emits nothing new — low-fps clips don't repeat
    frames), capped at ``max_frames`` (the media.py fan-out bound)."""
    if every_ms < 1 or max_frames < 1:
        raise ValueError(
            f"need every_ms >= 1 and max_frames >= 1, got "
            f"{every_ms}/{max_frames}"
        )
    out: list[tuple[int, int]] = []
    seen: set[int] = set()
    t = 0
    duration_ms = -(-n_frames * microsec_per_frame // 1000)
    while t < duration_ms and len(out) < max_frames:
        idx = min(t * 1000 // microsec_per_frame, n_frames - 1)
        if idx not in seen:
            seen.add(idx)
            out.append((int(idx), t))
        t += every_ms
    return out
