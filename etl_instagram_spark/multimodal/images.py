"""Multimodal columns: images (and other blobs) as opaque ``binary``
columns with typed metadata, plus decode / feature-extract / resize
plumbing over ``mapInPandas``.

The reference's only multimodal op is fetch-image-bytes → S3 put →
Rekognition (labels.js:12-48, W8); the engine generalizes to the
training-data-pipeline shape: a blobs table

    id STRING, content BINARY, media_type STRING,
    meta STRUCT<width: INT, height: INT, format: STRING>

PNG and baseline JPEG have REAL pure-stdlib decoders (png.py r12,
jpeg.py r14) — ``decoder='png'`` / ``decoder='jpeg'`` read dimensions
from the pixels. Formats the environment can't decode stay honestly
gated: ``decoder='pil'`` raises NotImplementedError unless Pillow is
importable; ``decoder='fake'`` produces deterministic metadata from the
bytes. The Spark-side contract — schema, Arrow batch shape,
partitioning advice — is identical across all four, so swapping in a
library decoder touches one function.

Scale notes: binary columns ride normal parquet (PLAIN-encoded byte
arrays); keep blobs in their own table keyed by content hash so the fact
table stays narrow, partition by ingest date, and size
``spark.sql.files.maxPartitionBytes`` so a partition of blobs fits
executor memory. ``mapInPandas`` streams Arrow record batches, so peak
memory is one batch of blobs, not one partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_SCHEMA = (
    "id STRING, content BINARY, media_type STRING, "
    "meta STRUCT<width: INT, height: INT, format: STRING>"
)

META_DDL = "width int, height int, format string"


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_meta(content: bytes | None) -> dict | None:
    """Deterministic stand-in for a real decode: dimensions derived from
    the content hash (stable across runs, no image library needed)."""
    if content is None:
        return None
    d = hashlib.md5(content).digest()
    return {
        "width": 64 + d[0] % 192,
        "height": 64 + d[1] % 192,
        "format": ["jpeg", "png", "webp"][d[2] % 3],
    }


def blobs_from_posts(posts: DataFrame, url_col: str = "media_url", content_col: str = "content") -> DataFrame:
    """Blob-table rows keyed by content hash (the engine's analogue of
    the S3 put keyed `{id}.jpg`, labels.js:33): content-addressing dedups
    identical images for free via the downstream exact-dedup groupBy."""
    return posts.filter(F.col(content_col).isNotNull()).select(
        F.md5(F.col(content_col)).alias("id"),
        F.col(content_col).alias("content"),
        F.lit("image").alias("media_type"),
        F.lit(None).cast(f"STRUCT<{META_DDL}>").alias("meta"),
    )


def decode_images(blobs: DataFrame, decoder: str = "fake") -> DataFrame:
    """Fill ``meta`` by decoding ``content``. Arrow-batched; the only
    Python boundary in the multimodal path.

    ``decoder='png'`` and ``decoder='jpeg'`` are REAL decodes
    (multimodal/png.py: chunk walk → zlib → unfilter; multimodal/
    jpeg.py: marker walk → Huffman → IDCT → upsample, baseline SOF0) —
    width/height come from the pixels, not a hash. ``decoder='webp'``
    (r18) is the REAL header parse (multimodal/webp.py: VP8L bit
    header / VP8 keyframe header / VP8X canvas) — dims without pixel
    decode, the only face WebP gets until someone writes a VP8 codec;
    'fake' stays the deterministic stub and 'pil' keeps its honest
    guard."""
    if decoder not in ("fake", "pil", "png", "jpeg", "webp"):
        raise ValueError(
            f"unknown decoder {decoder!r}; expected 'fake', 'png', "
            "'jpeg', 'webp', or 'pil'"
        )
    if decoder == "pil" and not _pil_available():
        raise NotImplementedError(
            "decoder='pil' requires Pillow, which is not installed in this "
            "environment; use decoder='png' / decoder='jpeg' (stdlib) or "
            "decoder='fake' (deterministic stub), or install PIL"
        )

    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in blobs.schema.fields if f.name != "meta"]
        + [f"meta struct<{META_DDL}>"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.drop(columns=["meta"], errors="ignore")
            if decoder == "fake":
                pdf["meta"] = pdf["content"].map(_fake_meta)
            elif decoder == "png":
                # header-only dims (IHDR parse) — the jpeg_dims twin:
                # this path returns only width/height; pixel_features
                # is the face that pays the zlib+unfilter decode
                from etl_instagram_spark.multimodal.png import png_dims

                def png_meta(b):
                    if b is None:
                        return None
                    w, h = png_dims(bytes(b))
                    return {"width": w, "height": h, "format": "png"}

                pdf["meta"] = pdf["content"].map(png_meta)
            elif decoder == "jpeg":
                # header-only dims (SOF0 parse): this path returns only
                # width/height, which the full Huffman+IDCT decode would
                # recompute at orders-of-magnitude higher cost per blob;
                # pixel_features is the face that consumes real pixels
                # via decode_jpeg. jpeg_dims rejects non-baseline files
                # with the same errors as the full decoder.
                from etl_instagram_spark.multimodal.jpeg import jpeg_dims

                def jpeg_meta(b):
                    if b is None:
                        return None
                    w, h = jpeg_dims(bytes(b))
                    return {"width": w, "height": h, "format": "jpeg"}

                pdf["meta"] = pdf["content"].map(jpeg_meta)
            elif decoder == "webp":
                # header-only dims — WebP's pixel decode stays a loud
                # gate (VP8/VP8L are real codec work); the header is
                # what the metadata path needs
                from etl_instagram_spark.multimodal.webp import webp_dims

                def webp_meta(b):
                    if b is None:
                        return None
                    w, h = webp_dims(bytes(b))
                    return {"width": w, "height": h, "format": "webp"}

                pdf["meta"] = pdf["content"].map(webp_meta)
            else:  # decoder == 'pil'
                from io import BytesIO

                from PIL import Image

                def pil_meta(b):
                    if b is None:
                        return None
                    img = Image.open(BytesIO(bytes(b)))
                    return {
                        "width": img.width,
                        "height": img.height,
                        "format": (img.format or "unknown").lower(),
                    }

                pdf["meta"] = pdf["content"].map(pil_meta)
            yield pdf

    return blobs.mapInPandas(run, schema=out_schema)


def image_features(blobs: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic feature vector per blob (stub for an embedding
    model forward pass): ``array<float>`` from the content digest. Output
    plugs straight into operators/similarity.py."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def feats(b):
                if b is None:
                    return None
                d = hashlib.sha256(bytes(b)).digest()
                return [(d[i % 32] - 128) / 128.0 for i in range(dim)]

            yield pd.DataFrame({"id": pdf["id"], "embedding": pdf["content"].map(feats)})

    return blobs.mapInPandas(run, schema="id string, embedding array<float>")


def _sniff_format(b: bytes) -> str | None:
    if b.startswith(b"\x89PNG\r\n\x1a\n"):
        return "png"
    if len(b) >= 2 and b[0] == 0xFF and b[1] == 0xD8:
        return "jpeg"
    return None


def pixel_features(blobs: DataFrame) -> DataFrame:
    """REAL content-based features from DECODED pixels (r14) — the
    non-stub sibling of :func:`image_features`, now that PNG and
    baseline JPEG have stdlib decoders: a fixed 16-dim vector of
    [aspect ratio, log-area, per-channel mean×3, per-channel std×3,
    8-bin luma histogram] per blob, format auto-sniffed from the magic
    bytes. Unknown/undecodable formats yield a NULL embedding (callers
    filter), never a fabricated vector.

    The output plugs straight into operators/similarity.py — because
    the features are statistics of the PIXELS, visually-identical
    images land near cosine 1 across lossless/lossy re-encodes (PNG vs
    baseline JPEG of the same frame), which makes this the real
    multimodal near-dup path: decode → pixel_features →
    embedding-cosine dedup. Arrow-batched mapInPandas, numpy per
    image; one batch of blobs in memory at a time."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from etl_instagram_spark.multimodal.jpeg import decode_jpeg
        from etl_instagram_spark.multimodal.png import decode_png

        def feats(b):
            if b is None:
                return None
            raw = bytes(b)
            fmt = _sniff_format(raw)
            if fmt is None:
                return None
            d = decode_png(raw) if fmt == "png" else decode_jpeg(raw)
            w, h, c = d["width"], d["height"], d["channels"]
            if w == 0 or h == 0:
                return None
            px = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w, c)
            if c == 1:
                rgb = np.repeat(px, 3, axis=2)
            elif c == 2:  # gray+alpha: stats over the gray plane
                rgb = np.repeat(px[:, :, :1], 3, axis=2)
            else:
                rgb = px[:, :, :3]
            rgbf = rgb.astype(np.float64)
            luma = (
                0.299 * rgbf[:, :, 0]
                + 0.587 * rgbf[:, :, 1]
                + 0.114 * rgbf[:, :, 2]
            )
            hist, _ = np.histogram(luma, bins=8, range=(0.0, 256.0))
            hist = hist / luma.size
            out = [
                min(w, h) / max(w, h),
                min(1.0, np.log1p(float(w) * h) / np.log(2.0**24)),
                *(rgbf[:, :, i].mean() / 255.0 for i in range(3)),
                *(rgbf[:, :, i].std() / 128.0 for i in range(3)),
                *hist.tolist(),
            ]
            return [float(x) for x in out]

        for pdf in batches:
            yield pd.DataFrame(
                {"id": pdf["id"], "embedding": pdf["content"].map(feats)}
            )

    return blobs.mapInPandas(run, schema="id string, embedding array<float>")
