"""External-enrichment boundary: image → labels (the reference's
Rekognition call, labels.js:51-80) as a pluggable ``mapInPandas`` stage.

The reference fetches each post image, puts it to S3, and calls
DetectLabels (MaxLabels=10), renaming ``{Confidence, Name}`` →
``{confidence, name}`` (posts-from-hashtags.js:327-333). The engine keeps
the classifier behind a batch-function interface so a real client
(Rekognition, an in-process model, a Triton endpoint) can be plugged in,
and ships a DETERMINISTIC stub with the same output schema for tests and
offline runs.

Scale notes: ``mapInPandas`` streams Arrow batches through Python — the
classifier amortizes per-batch (client call batching, model forward pass)
instead of per-row. The enrichment runs AFTER the anti-join/blocklist
prune (SURVEY §4: anti-join before expensive UDFs), so only genuinely new
rows pay for it.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_LABELS = 10  # labels.js:59

# fixed public vocabulary for the stub (stands in for Rekognition's label
# space; values are arbitrary but stable)
STUB_VOCAB = (
    "Food", "Plant", "Person", "Furniture", "Animal", "Building", "Vehicle",
    "Drink", "Text", "Nature", "Art", "Clothing", "Electronics", "Sport",
)

Classifier = Callable[[pd.Series], pd.Series]
"""Maps a pandas Series of media URLs (or blob keys) to a Series of
``list[dict(confidence: float, name: str)]``."""


def stub_classifier(urls: pd.Series) -> pd.Series:
    """Deterministic fake: labels + confidences derived from md5 of the
    URL. Same output schema and MaxLabels cap as the real service."""
    def labels_for(url: str | None) -> list[dict] | None:
        if url is None:
            return None
        digest = hashlib.md5(url.encode()).digest()
        n = 1 + digest[0] % MAX_LABELS
        out = []
        for i in range(n):
            name = STUB_VOCAB[digest[i % 16] % len(STUB_VOCAB)]
            conf = round(50.0 + (digest[(i + 1) % 16] / 255.0) * 50.0, 2)
            if name not in [o["name"] for o in out]:
                out.append({"confidence": conf, "name": name})
        return sorted(out, key=lambda o: (-o["confidence"], o["name"]))

    return urls.map(labels_for)


def attach_labels(
    df: DataFrame,
    url_col: str = "media_url",
    out_col: str = "labels",
    classifier: Classifier = stub_classifier,
) -> DataFrame:
    """Attach ``array<struct<confidence: double, name: string>>`` labels
    by running ``classifier`` over Arrow batches of the URL column."""
    out_field = f"{out_col} array<struct<confidence: double, name: string>>"
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields if f.name != out_col]
        + [out_field]
    )
    url_idx = url_col

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.drop(columns=[out_col], errors="ignore")
            pdf[out_col] = classifier(pdf[url_idx])
            yield pdf

    return df.mapInPandas(run, schema=schema)
