"""Live-fetch boundary: rate-limited URL fetching as a pluggable
``mapInPandas`` stage (S1/S2/E4).

The reference fetches politely — one page at a time with a 10 s sleep
(support/fetch.js:7-15, mapSeries E5). In the engine, fetching is a
source-side enrichment over a URL column; politeness becomes a token
bucket INSIDE the fetch UDF (per-task), plus a bounded number of
partitions for a global cap. The network client is injected; the default
is a deterministic stub so tests and offline runs never touch the
network.

Scale notes: fetch tasks are I/O-bound — schedule them on a dedicated
small partition count (``repartition(n_parallel)``) rather than the
cluster default, or the token bucket ends up rate-limiting thousands of
idle tasks. Failures return null html (E3 row-level skip); the caller
routes nulls/sentinels to the dead-letter table.
"""

from __future__ import annotations

import hashlib
import time
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

Fetcher = Callable[[str], str | None]


def stub_fetcher(url: str) -> str | None:
    """Deterministic offline fetcher: synthesizes a page from the URL."""
    digest = hashlib.md5(url.encode()).hexdigest()[:8]
    return f"<html><body data-url='{url}' data-sig='{digest}'>stub page</body></html>"


class TokenBucket:
    """min_interval seconds between acquisitions (per task)."""

    def __init__(self, min_interval_s: float):
        self.min_interval_s = min_interval_s
        self._last = 0.0

    def acquire(self) -> None:
        now = time.monotonic()
        wait = self._last + self.min_interval_s - now
        if wait > 0:
            time.sleep(wait)
        self._last = time.monotonic()


def fetch_pages(
    urls: DataFrame,
    url_col: str = "url",
    fetcher: Fetcher = stub_fetcher,
    min_interval_s: float = 0.0,
    n_parallel: int | None = None,
) -> DataFrame:
    """Attach an ``html`` column by fetching each URL, throttled to one
    request per ``min_interval_s`` seconds per task. Row-level failures
    yield null html instead of failing the job (E3)."""
    if n_parallel is not None:
        urls = urls.repartition(n_parallel)
    keep = [f.name for f in urls.schema.fields]
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in urls.schema.fields] + ["html string"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bucket = TokenBucket(min_interval_s)

        def one(url: str | None) -> str | None:
            if url is None:
                return None
            bucket.acquire()
            try:
                return fetcher(url)
            except Exception:  # noqa: BLE001 — E3: skip row, never fail the job
                return None

        for pdf in batches:
            out = pdf[keep].copy()
            out["html"] = pdf[url_col].map(one)
            yield out

    return urls.mapInPandas(run, schema=schema)
