"""WebP header parsing in pure stdlib — the METADATA face for the one
image format whose pixel decode stays honestly gated (VP8's boolean
arithmetic coder and VP8L's transform/prefix pipeline are real codec
work, not a stdlib job — the png.py/jpeg.py contract is a loud
NotImplementedError, never a fabricated pixel).

What a 100 TB image-corpus pipeline needs FIRST is the header: width/
height for aspect/area stats, layout decisions, and size filters —
the same reason jpeg_dims/png_dims exist (decode_images' metadata
path). All three WebP container flavors carry dims in their first
chunk, each documented in the public WebP container / VP8 / VP8L
bitstream specifications:

- ``VP8L`` (lossless): signature byte 0x2F, then 14-bit width-1 and
  14-bit height-1, LSB-first.
- ``VP8 `` (lossy): 3-byte frame tag (keyframe bit + version +
  show_frame + partition size), the 0x9D 0x01 0x2A start code, then
  16-bit little-endian width and height (low 14 bits each; the top 2
  bits are the rescaling hint).
- ``VP8X`` (extended): 4 feature/reserved bytes, then 24-bit
  little-endian canvas width-1 and height-1.

Reference behavior parity: the reference only ever moves image BYTES
(labels.js:12-48) and never decodes; this is engine-native extension
surface, same as the other multimodal decoders.
"""

from __future__ import annotations

import struct


def webp_dims(data: bytes) -> tuple[int, int]:
    """``(width, height)`` from a WebP container's first chunk header —
    no pixel decode. Raises ``ValueError`` on malformed containers
    (truncation, bad signatures, zero dims) with the offending field
    named; an unknown leading chunk raises ``NotImplementedError``."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise TypeError(f"expected bytes, got {type(data).__name__}")
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (missing RIFF/WEBP header)")
    if len(data) < 20:
        raise ValueError("webp: truncated before the first chunk header")
    fourcc = data[12:16]
    (size,) = struct.unpack("<I", data[16:20])
    body = data[20 : 20 + size]
    if len(body) < size:
        raise ValueError(f"webp: truncated {fourcc!r} chunk body")
    if fourcc == b"VP8L":
        if len(body) < 5:
            raise ValueError("webp: VP8L chunk shorter than its header")
        if body[0] != 0x2F:
            raise ValueError(
                f"webp: bad VP8L signature byte 0x{body[0]:02X} (want 0x2F)"
            )
        bits = struct.unpack("<I", body[1:5])[0]  # LSB-first bit stream
        width = (bits & 0x3FFF) + 1
        height = ((bits >> 14) & 0x3FFF) + 1
        version = (bits >> 29) & 0x7
        if version != 0:
            raise ValueError(f"webp: VP8L version {version} (want 0)")
        return width, height
    if fourcc == b"VP8 ":
        if len(body) < 10:
            raise ValueError("webp: VP8 chunk shorter than its frame header")
        if body[0] & 0x01:
            raise ValueError(
                "webp: VP8 first frame is an interframe (keyframe bit set)"
            )
        if body[3:6] != b"\x9d\x01\x2a":
            raise ValueError("webp: bad VP8 keyframe start code")
        width = struct.unpack("<H", body[6:8])[0] & 0x3FFF
        height = struct.unpack("<H", body[8:10])[0] & 0x3FFF
        if width == 0 or height == 0:
            raise ValueError("webp: zero VP8 frame dimensions")
        return width, height
    if fourcc == b"VP8X":
        if len(body) < 10:
            raise ValueError("webp: VP8X chunk shorter than 10 bytes")
        width = int.from_bytes(body[4:7], "little") + 1
        height = int.from_bytes(body[7:10], "little") + 1
        return width, height
    raise NotImplementedError(
        f"webp: unknown leading chunk {fourcc!r} (VP8 /VP8L/VP8X only)"
    )
