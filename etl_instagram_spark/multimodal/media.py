"""Video / audio columns: frame sampling and fixed-width audio chunking
over opaque ``binary`` columns — the one-row-in / many-rows-out decode
shape that ``explode`` cannot express (the expansion happens INSIDE the
decode step), so both are ``mapInPandas`` UDTFs.

Same contract as images.py: COMPRESSED codec work needs libraries
absent from this environment (PyAV / soundfile), so those decoders
raise — NotImplementedError for the known real decoder (even when the
library is importable: no real decode exists yet, and falling through to
the stub would hand fabricated frames to downstream consumers),
ValueError for unknown strings. ``decoder='fake'``
synthesizes deterministic output from the content hash. Audio gained a
REAL uncompressed path in r15 — ``chunk_audio(decoder='wav')`` slices
actual PCM frames via the pure-stdlib multimodal/wav.py parser (the
PNG/JPEG precedent applied to the one audio container stdlib can fully
handle), and wav.wav_features extracts real sample statistics for the
embedding-cosine near-dup path. The Spark-side
plumbing — schemas, Arrow batch shape, per-row fan-out, partitioning —
is real and tested; swapping in a real codec touches one inner function.

Scale notes (100 TB of video is the norm, not the exception):
- sample frames EARLY and drop the source bytes: a 10 MB clip at 1 frame
  per 2 s becomes ~15 thumbnail rows; the downstream pipeline (feature
  extraction, similarity, dedup) never re-reads the clip,
- one input row fans out to ``max_frames``/``max_chunks`` bounded rows,
  so output partition size is bounded by input partition size × fan-out
  — size ``spark.sql.files.maxPartitionBytes`` for the SOURCE blobs and
  let AQE coalesce the decoded side,
- frames/chunks carry (id, index, timestamp) so window/session analytics
  and cross-modal joins (frame ⋈ transcript span) are plain equi/range
  joins downstream.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

VIDEO_META_DDL = "duration_ms int, fps int, width int, height int"
# clamped_blocks (r18, ADVICE): ADPCM blocks a truncating ``fact``
# chunk pushed past the duration grid and into the LAST chunk — nonzero
# only on that chunk, so consumers can detect fact-overflow chunks
# whose size/duration metadata no longer reflects the clamped bytes
AUDIO_META_DDL = (
    "duration_ms int, sample_rate int, channels int, clamped_blocks int"
)

FRAME_SCHEMA = (
    "id string, frame_idx int, ts_ms int, frame binary, "
    f"meta struct<{VIDEO_META_DDL}>"
)
CHUNK_SCHEMA = (
    "id string, chunk_idx int, start_ms int, end_ms int, samples binary, "
    f"meta struct<{AUDIO_META_DDL}>"
)


def _codec_available(module: str) -> bool:
    try:
        __import__(module)
        return True
    except ImportError:
        return False


def _require_decoder(decoder: str, real_module: str, real_label: str) -> None:
    """'fake' is the ONLY implemented decode path today. The known real
    decoder raises NotImplementedError — even when the codec library IS
    importable — so synthesized hash-derived frames can never masquerade
    as real decodes downstream; unknown strings raise ValueError (same
    contract as images.decode_images)."""
    if decoder == "fake":
        return
    if decoder != real_module:
        raise ValueError(
            f"unknown decoder {decoder!r}; expected 'fake' or {real_module!r}"
        )
    if not _codec_available(real_module):
        raise NotImplementedError(
            f"decoder={decoder!r} requires {real_label}, which is not "
            "installed in this environment; use decoder='fake' "
            "(deterministic stub)"
        )
    raise NotImplementedError(
        f"decoder={decoder!r}: real decode is not implemented yet; "
        "decoder='fake' (deterministic stub) is the only working path"
    )


def _fake_video_meta(content: bytes) -> dict:
    d = hashlib.md5(content).digest()
    return {
        "duration_ms": 2_000 + int.from_bytes(d[0:2], "big") % 28_000,
        "fps": (24, 25, 30)[d[2] % 3],
        "width": 320 + 16 * (d[3] % 60),
        "height": 240 + 16 * (d[4] % 45),
    }


def _fake_audio_meta(content: bytes) -> dict:
    d = hashlib.md5(content).digest()
    return {
        "duration_ms": 1_000 + int.from_bytes(d[0:2], "big") % 59_000,
        "sample_rate": (16_000, 22_050, 44_100)[d[2] % 3],
        "channels": 1 + d[3] % 2,
        "clamped_blocks": 0,
    }


def _fake_bytes(seed: bytes, n: int = 32) -> bytes:
    out = b""
    ctr = 0
    while len(out) < n:
        out += hashlib.sha256(seed + ctr.to_bytes(4, "big")).digest()
        ctr += 1
    return out[:n]


def sample_frames(
    blobs: DataFrame,
    every_ms: int = 2_000,
    max_frames: int = 16,
    decoder: str = "fake",
    id_col: str = "id",
    content_col: str = "content",
) -> DataFrame:
    """One row per sampled frame of each video blob: every ``every_ms``
    of media time, capped at ``max_frames`` (the fan-out bound that keeps
    output partitions proportional to input partitions).

    ``decoder='mjpeg'`` (r15) is a REAL path: multimodal/avi.py's
    pure-stdlib RIFF/AVI walk reads the true timing/dims header and
    emits the ACTUAL stored frame under each sample tick — ``frame`` is
    that frame's raw baseline-JPEG bytes, which multimodal/jpeg.py
    decodes wherever a consumer wants pixels (images.pixel_features
    composes directly for video near-dup). Audio-MUXED files demux
    (r18): the video ticks are identical to a solo-video file's, and
    the audio tracks are reachable via ``avi.avi_audio_wav`` →
    ``chunk_audio(decoder='wav')``. Undecodable containers,
    multi-VIDEO-stream files, and non-vids/auds stream types raise
    LOUDLY; every other codec keeps the honest ``decoder='av'`` gate
    below."""
    if decoder == "mjpeg":
        from etl_instagram_spark.multimodal.avi import (
            parse_avi,
            sample_frame_indices,
        )

        def run_mjpeg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out: dict[str, list] = {k: [] for k in
                                        ("id", "frame_idx", "ts_ms", "frame", "meta")}
                for bid, content in zip(pdf[id_col], pdf[content_col]):
                    if content is None:
                        continue
                    v = parse_avi(bytes(content))
                    mspf = v["microsec_per_frame"]
                    meta = {
                        "duration_ms": v["duration_ms"],
                        "fps": int(round(1_000_000 / mspf)),
                        "width": v["width"],
                        "height": v["height"],
                    }
                    for idx, ts in sample_frame_indices(
                        v["n_frames"], mspf, every_ms, max_frames
                    ):
                        out["id"].append(bid)
                        out["frame_idx"].append(idx)
                        out["ts_ms"].append(ts)
                        out["frame"].append(v["frames"][idx])
                        out["meta"].append(meta)
                if out["id"]:  # an empty frame mis-infers dtypes for Arrow
                    yield pd.DataFrame(out)

        return blobs.mapInPandas(run_mjpeg, schema=FRAME_SCHEMA)
    _require_decoder(decoder, "av", "PyAV")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in
                                    ("id", "frame_idx", "ts_ms", "frame", "meta")}
            for bid, content in zip(pdf[id_col], pdf[content_col]):
                if content is None:
                    continue
                content = bytes(content)
                meta = _fake_video_meta(content)
                n = min(max_frames, 1 + meta["duration_ms"] // every_ms)
                for i in range(n):
                    out["id"].append(bid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    out["frame"].append(_fake_bytes(content + i.to_bytes(4, "big")))
                    out["meta"].append(meta)
            if out["id"]:  # an empty frame mis-infers dtypes for Arrow
                yield pd.DataFrame(out)

    return blobs.mapInPandas(run, schema=FRAME_SCHEMA)


def chunk_audio(
    blobs: DataFrame,
    chunk_ms: int = 5_000,
    max_chunks: int = 32,
    decoder: str = "fake",
    id_col: str = "id",
    content_col: str = "content",
) -> DataFrame:
    """Fixed-width audio windows per blob — the shape ASR/embedding
    models consume; (start_ms, end_ms) make transcript alignment a range
    join downstream.

    ``decoder='wav'`` (r15) is a REAL path: multimodal/wav.py's
    pure-stdlib RIFF/PCM parser slices the actual interleaved PCM
    frames per window (``samples`` = the window's raw frame bytes;
    concatenating every un-capped chunk reproduces the whole data
    chunk byte-for-byte — pinned by test) and fills meta from the real
    header. G.711 mu-law/A-law (r16) ride the same frame grid (one
    companded byte per channel per frame). IMA ADPCM (r16) and MS
    ADPCM (r17) slice at BLOCK granularity — every block decodes
    independently per both specs, so a chunk's ``samples`` bytes are
    themselves a decodable block run; each block is assigned to the chunk its FIRST sample's
    millisecond falls in (blocks a truncating ``fact`` chunk pushes
    past the duration grid clamp into the last chunk when max_chunks
    does not bind — r17), so the un-capped concatenation contract
    holds byte-for-byte for fact-truncated files too. Undecodable/unknown-codec content
    raises LOUDLY (pre-filter with a RIFF sniff if the column is
    mixed); compressed codecs keep the honest ``decoder='soundfile'``
    gate below."""
    if decoder == "wav":
        from etl_instagram_spark.multimodal.wav import wav_info

        def run_wav(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out: dict[str, list] = {k: [] for k in
                                        ("id", "chunk_idx", "start_ms", "end_ms", "samples", "meta")}
                for bid, content in zip(pdf[id_col], pdf[content_col]):
                    if content is None:
                        continue
                    info = wav_info(bytes(content))
                    meta = {
                        "duration_ms": info["duration_ms"],
                        "sample_rate": info["sample_rate"],
                        "channels": info["channels"],
                        "clamped_blocks": 0,
                    }
                    rate, block = info["sample_rate"], info["block_align"]
                    nf, pcm = info["n_frames"], info["pcm"]
                    n = min(max_chunks, -(-info["duration_ms"] // chunk_ms))
                    if info["fmt"] in ("ima_adpcm", "ms_adpcm"):
                        spb = info["samples_per_block"]
                        n_uncapped = -(-info["duration_ms"] // chunk_ms)
                        parts: list[list[bytes]] = [[] for _ in range(n)]
                        n_clamped = 0
                        for b in range(-(-len(pcm) // block)):
                            ms = b * spb * 1000 // rate
                            ci = ms // chunk_ms
                            if ci >= n == n_uncapped > 0:
                                # max_chunks does NOT bind, so every raw
                                # block belongs somewhere: a fact chunk
                                # that caps n_frames below the raw block
                                # stream pushes trailing blocks past the
                                # duration grid — clamp them into the
                                # last chunk so the un-capped
                                # concatenation contract stays
                                # byte-for-byte (r17, ADVICE)
                                ci = n - 1
                                n_clamped += 1
                            if ci < n:
                                parts[ci].append(
                                    pcm[b * block : (b + 1) * block]
                                )
                        for i in range(n):
                            start = i * chunk_ms
                            end = min(start + chunk_ms, info["duration_ms"])
                            out["id"].append(bid)
                            out["chunk_idx"].append(i)
                            out["start_ms"].append(start)
                            out["end_ms"].append(end)
                            out["samples"].append(b"".join(parts[i]))
                            out["meta"].append(
                                {**meta, "clamped_blocks": n_clamped}
                                if i == n - 1
                                else meta
                            )
                        continue
                    for i in range(n):
                        start = i * chunk_ms
                        end = min(start + chunk_ms, info["duration_ms"])
                        f0 = start * rate // 1000
                        f1 = min(end * rate // 1000, nf)
                        out["id"].append(bid)
                        out["chunk_idx"].append(i)
                        out["start_ms"].append(start)
                        out["end_ms"].append(end)
                        out["samples"].append(pcm[f0 * block : f1 * block])
                        out["meta"].append(meta)
                if out["id"]:  # an empty frame mis-infers dtypes for Arrow
                    yield pd.DataFrame(out)

        return blobs.mapInPandas(run_wav, schema=CHUNK_SCHEMA)
    _require_decoder(decoder, "soundfile", "the soundfile library")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in
                                    ("id", "chunk_idx", "start_ms", "end_ms", "samples", "meta")}
            for bid, content in zip(pdf[id_col], pdf[content_col]):
                if content is None:
                    continue
                content = bytes(content)
                meta = _fake_audio_meta(content)
                n = min(max_chunks, -(-meta["duration_ms"] // chunk_ms))
                for i in range(n):
                    start = i * chunk_ms
                    out["id"].append(bid)
                    out["chunk_idx"].append(i)
                    out["start_ms"].append(start)
                    out["end_ms"].append(min(start + chunk_ms, meta["duration_ms"]))
                    out["samples"].append(_fake_bytes(content + i.to_bytes(4, "big"), 64))
                    out["meta"].append(meta)
            if out["id"]:  # an empty frame mis-infers dtypes for Arrow
                yield pd.DataFrame(out)

    return blobs.mapInPandas(run, schema=CHUNK_SCHEMA)
