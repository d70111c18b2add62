"""MP3 (MPEG audio) frame-header parsing in pure stdlib — the
METADATA face for the compressed-audio formats whose PCM decode stays
honestly gated (a Layer III decoder — Huffman tables, IMDCT, synthesis
filterbank — is real codec work, not a stdlib job; the wav.py contract
is a loud NotImplementedError, never fabricated samples).

What an audio-corpus pipeline needs FIRST is the stream header walk:
sample rate, channel mode, frame count, and duration for profiling,
layout, and length filters — the webp_dims/jpeg_dims reasoning for the
third modality. All of it sits in the fixed 4-byte frame headers of
the public ISO/IEC 11172-3 (MPEG-1) / 13818-3 (MPEG-2, 2.5 extension)
layout: 11-bit sync, version, layer, bitrate index, sample-rate index,
padding bit, channel mode — with the published bitrate/sample-rate
tables and the per-layer frame-size formulas. ID3v2 leaders and ID3v1
trailers are skipped by their own public layouts.

Honest-gate scope: every frame header must parse and land exactly on
the next frame (or the ID3v1 trailer / EOF) — a malformed header, a
reserved version/layer/index, truncation mid-frame, or trailing
garbage raises loudly with the byte offset named; the free-format
bitrate (index 0, frame size undeclared) raises NotImplementedError.
"""

from __future__ import annotations

# bitrate tables in kbps, indexed [1..14] (0 = free-format, 15 = bad);
# keyed by (mpeg1?, layer)
_BITRATES = {
    (True, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (True, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (True, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (False, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    # MPEG-2/2.5 Layers II and III share one table
    (False, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (False, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}

_SAMPLE_RATES = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}


def _id3v2_size(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 when absent)."""
    if len(data) < 10 or data[:3] != b"ID3":
        return 0
    if any(b & 0x80 for b in data[6:10]):
        raise ValueError("mp3: ID3v2 size bytes are not syncsafe")
    size = (
        (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    )
    footer = 10 if data[5] & 0x10 else 0
    return 10 + size + footer


def mp3_info(data: bytes) -> dict:
    """Walk every frame header → ``{version, layer, sample_rate,
    channels, n_frames, duration_ms, bitrate_kbps, vbr}`` with
    ``bitrate_kbps`` the frame-weighted mean (== the constant rate for
    CBR streams) and ``vbr`` True when frames carry more than one
    rate. No PCM decode — the profiling face only."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise TypeError(f"expected bytes, got {type(data).__name__}")
    data = bytes(data)
    pos = _id3v2_size(data)
    end = len(data)
    # ID3v1 trailer: fixed 128 bytes, 'TAG' lead
    if end - pos >= 128 and data[end - 128 : end - 125] == b"TAG":
        end -= 128
    if pos >= end:
        raise ValueError("mp3: no audio frames (tags only)")

    n_frames = 0
    props: tuple | None = None  # (version, layer, sample_rate, channels)
    kbps_sum = 0
    rates: set[int] = set()
    samples_per_frame = 0
    while pos < end:
        if end - pos < 4:
            raise ValueError(
                f"mp3: truncated frame header at byte {pos} "
                f"({end - pos} byte(s) left)"
            )
        h = int.from_bytes(data[pos : pos + 4], "big")
        if (h >> 21) & 0x7FF != 0x7FF:
            raise ValueError(
                f"mp3: lost frame sync at byte {pos} "
                f"(0x{data[pos]:02X}{data[pos + 1]:02X}…)"
            )
        vbits = (h >> 19) & 0x3
        if vbits == 1:
            raise ValueError(f"mp3: reserved MPEG version at byte {pos}")
        version = {0: "2.5", 2: "2", 3: "1"}[vbits]
        mpeg1 = version == "1"
        lbits = (h >> 17) & 0x3
        if lbits == 0:
            raise ValueError(f"mp3: reserved layer at byte {pos}")
        layer = 4 - lbits  # 3->I, 2->II, 1->III
        br_idx = (h >> 12) & 0xF
        if br_idx == 15:
            raise ValueError(f"mp3: bad bitrate index at byte {pos}")
        if br_idx == 0:
            raise NotImplementedError(
                f"mp3: free-format bitrate at byte {pos} (frame size "
                "undeclared — not supported)"
            )
        sr_idx = (h >> 10) & 0x3
        if sr_idx == 3:
            raise ValueError(f"mp3: reserved sample-rate index at byte {pos}")
        padding = (h >> 9) & 0x1
        mode = (h >> 6) & 0x3
        channels = 1 if mode == 3 else 2
        kbps = _BITRATES[(mpeg1, layer)][br_idx - 1]
        sr = _SAMPLE_RATES[version][sr_idx]
        if layer == 1:
            frame_len = (12 * kbps * 1000 // sr + padding) * 4
            spf = 384
        elif layer == 2:
            frame_len = 144 * kbps * 1000 // sr + padding
            spf = 1152
        else:  # Layer III
            spf = 1152 if mpeg1 else 576
            frame_len = (spf // 8) * kbps * 1000 // sr + padding
        this = (version, layer, sr, channels)
        if props is None:
            props = this
            samples_per_frame = spf
        elif this != props:
            raise ValueError(
                f"mp3: stream properties change mid-file at byte {pos} "
                f"({props} -> {this})"
            )
        if pos + frame_len > end:
            raise ValueError(
                f"mp3: frame at byte {pos} runs past the stream end "
                f"(needs {frame_len}, {end - pos} left)"
            )
        n_frames += 1
        kbps_sum += kbps
        rates.add(kbps)
        pos += frame_len

    version, layer, sr, channels = props  # props set: loop ran >= once
    total_samples = n_frames * samples_per_frame
    return {
        "version": version,
        "layer": layer,
        "sample_rate": sr,
        "channels": channels,
        "n_frames": n_frames,
        # ceil, the wav_info convention
        "duration_ms": -(-total_samples * 1000 // sr),
        "bitrate_kbps": round(kbps_sum / n_frames, 1),
        "vbr": len(rates) > 1,
    }
