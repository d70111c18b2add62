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

Honest-gate scope (the png/jpeg/wav contract): one video stream,
compressed ('##dc') or uncompressed-DIB ('##db') chunks where each
chunk is a whole baseline JPEG — everything else (AVIX/OpenDML
extensions beyond the first RIFF, audio streams, any non-JPEG fourcc
when frames are actually decoded) raises loudly. The reference never
decodes media (labels.js:12-48 moves bytes); this is engine-native
extension surface.
"""

from __future__ import annotations

import struct

_VIDEO_CHUNK_SUFFIXES = (b"dc", b"db")


def parse_avi(data: bytes) -> dict:
    """Container walk → ``{width, height, n_frames,
    microsec_per_frame, duration_ms, frames}`` with ``frames`` the
    list of raw video-chunk payloads (one bytes object per stored
    frame, in stream order). ``n_frames`` is the count of stored
    frames actually found (``avih``'s dwTotalFrames is advisory and
    cross-checked only when nonzero). Raises ``ValueError`` on
    malformed containers and ``NotImplementedError`` on multi-stream
    files — loudly, never silently wrong."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise TypeError(f"expected bytes, got {type(data).__name__}")
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI header)")

    avih: dict | None = None
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
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
                # list type then sub-chunks
                walk(body_start + 4, body_start + size)
            elif cid == b"avih":
                if size < 40:
                    raise ValueError("avi: avih chunk shorter than 40 bytes")
                (mspf, _maxrate, _pad, _flags, total, _init, streams, _buf,
                 width, height) = struct.unpack(
                    "<10I", data[body_start : body_start + 40]
                )
                if streams != 1:
                    raise NotImplementedError(
                        f"avi: {streams}-stream files not supported (one "
                        "video stream only; audio-muxed AVIs stay a loud "
                        "gate)"
                    )
                if mspf == 0 or width == 0 or height == 0:
                    raise ValueError(
                        "avi: implausible avih (zero frame period or dims)"
                    )
                avih = {
                    "microsec_per_frame": mspf,
                    "total_frames": total,
                    "width": width,
                    "height": height,
                }
            elif cid[2:4] in _VIDEO_CHUNK_SUFFIXES and cid[:2].isdigit():
                frames.append(data[body_start : body_start + size])
            pos = body_start + size + (size & 1)  # word-aligned

    walk(12, len(data))
    if avih is None:
        raise ValueError("avi: missing avih header (truncated file?)")
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
    }


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
