"""Tests for the engine's Python boundaries: HTML extraction UDTFs,
rate-limited fetch, observable metrics, blob sink."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from etl_instagram_spark.multimodal.blob_sink import local_dir_client, put_blobs
from etl_instagram_spark.operators.metrics import observed_counts
from etl_instagram_spark.sources.fetch import fetch_pages, stub_fetcher
from etl_instagram_spark.sources.html_extract import (
    extract_article,
    extract_news_items,
    extract_rate_rows,
)

NEWS_HTML = """
<html><body>
  <div class="news--box">
    <button data-title="Headline A" data-url="/a" data-image="/img/a.jpg">go</button>
  </div>
  <div class="news--box">
    <button data-title="Headline B" data-url="/b" data-image="/img/b.jpg">go</button>
  </div>
  <div class="other"><button data-title="nope" data-url="/x"></button></div>
</body></html>
"""

ARTICLE_HTML = """
<html><body>
  <h1>The Title</h1>
  <img src="/img/lead.jpg"/>
  <p>First paragraph.</p>
  <p></p>
  <p>Second paragraph.</p>
</body></html>
"""

RATES_HTML = """
<html><body><table id="dllsTable"><tbody>
  <tr><td><a title="BankA" href="//a.mx">A</a></td>
      <td class="xTimes">19.50</td><td class="xTimes">19.90</td></tr>
  <tr><td><a title="BankB" href="//b.mx">B</a></td>
      <td class="xTimes">20.10</td></tr>
</tbody></table></body></html>
"""


def test_extract_news_items(spark):
    pages = spark.createDataFrame([("u1", NEWS_HTML)], "url string, html string")
    rows = extract_news_items(pages).collect()
    assert [(r["title"], r["url"], r["image"]) for r in rows] == [
        ("Headline A", "/a", "/img/a.jpg"),
        ("Headline B", "/b", "/img/b.jpg"),
    ]


def test_extract_article(spark):
    pages = spark.createDataFrame([("u1", ARTICLE_HTML)], "url string, html string")
    row = extract_article(pages).collect()[0]
    assert row["title"] == "The Title"
    assert row["image"] == "/img/lead.jpg"
    assert row["paragraphs"] == ["First paragraph.", "Second paragraph."]


def test_extract_rate_rows(spark):
    pages = spark.createDataFrame([("u1", RATES_HTML)], "url string, html string")
    rows = {r["entity"]: r for r in extract_rate_rows(pages).collect()}
    assert rows["BankA"]["buy"] == "19.50" and rows["BankA"]["sell"] == "19.90"
    assert rows["BankB"]["buy"] == "20.10" and rows["BankB"]["sell"] is None  # P9 falls back
    assert rows["BankA"]["url"] == "//a.mx"


def test_fetch_pages_stub_and_throttle(spark):
    urls = spark.createDataFrame([(f"https://x/{i}",) for i in range(4)], "url string")
    out = fetch_pages(urls, n_parallel=1).collect()
    assert all(r["html"] and r["url"] in r["html"] for r in out)
    # same URL → same stub page (deterministic)
    again = fetch_pages(urls, n_parallel=1).collect()
    assert sorted(r["html"] for r in out) == sorted(r["html"] for r in again)

    # throttle: 4 sequential fetches at >=0.2s spacing take >=0.6s
    t0 = time.perf_counter()
    fetch_pages(urls, min_interval_s=0.2, n_parallel=1).collect()
    assert time.perf_counter() - t0 >= 0.6


def test_fetch_failure_yields_null_html(spark):
    def flaky(url):
        if url.endswith("bad"):
            raise RuntimeError("boom")
        return stub_fetcher(url)

    urls = spark.createDataFrame([("https://x/ok",), ("https://x/bad",)], "url string")
    rows = {r["url"]: r["html"] for r in fetch_pages(urls, fetcher=flaky).collect()}
    assert rows["https://x/ok"] is not None
    assert rows["https://x/bad"] is None  # E3: row-level skip


def test_observed_counts_piggyback(spark, sf_smoke):
    from etl_instagram_spark.sources.tables import load_table

    li = load_table(spark, sf_smoke, "lineitem").filter(F.col("l_quantity") > 10)
    df, obs = observed_counts(li, "ingest", "l_quantity")
    n = df.count()  # the ONLY action; metrics ride along
    assert obs.get["n_rows"] == n
    assert obs.get["sum_l_quantity"] > 10 * n


def test_put_blobs_local_client(spark, tmp_path):
    root = str(tmp_path / "store")
    blobs = spark.createDataFrame(
        [("aa", bytearray(b"bytes-a")), ("bb", bytearray(b"bytes-b")), ("cc", None)],
        "id string, content binary",
    )
    put_blobs(blobs, lambda: local_dir_client(root))
    assert sorted(os.listdir(root)) == ["aa.jpg", "bb.jpg"]
    with open(os.path.join(root, "aa.jpg"), "rb") as f:
        assert f.read() == b"bytes-a"


def test_engine_config_from_env():
    import pytest

    from etl_instagram_spark.config import ConfigError, EngineConfig

    cfg = EngineConfig.from_env({"ETL_ENV": "production", "ETL_HASHTAGS": "food, travel"})
    assert cfg.hashtags == ("food", "travel")
    assert cfg.dev_limit is None and cfg.fetch_interval_s == 10.0
    assert cfg.followers_per_run == 10

    dev = EngineConfig.from_env({})
    assert dev.dev_limit == 1 and dev.fetch_interval_s == 1.0  # P14/E4 dev mode

    with pytest.raises(ConfigError):
        EngineConfig.from_env({"ETL_ENV": "staging"})
    with pytest.raises(ConfigError):
        EngineConfig.from_env({"ETL_FOLLOWERS_PER_RUN": "zero"})
    with pytest.raises(ConfigError):
        EngineConfig.from_env({"ETL_MAX_LABELS": "1000"})


def test_sample_frames_fan_out_and_determinism(spark):
    from etl_instagram_spark.multimodal import media as M

    blobs = spark.createDataFrame(
        [("v1", b"video-bytes-aaaa"), ("v2", b"video-bytes-bbbb"), ("v3", None)],
        "id string, content binary",
    )
    frames = M.sample_frames(blobs, every_ms=2_000, max_frames=4).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["id"], []).append(r)
    assert "v3" not in by_id  # null content skipped (E3 row-level skip)
    for vid, rows in by_id.items():
        assert 1 <= len(rows) <= 4
        assert [r["frame_idx"] for r in rows] == list(range(len(rows)))
        assert [r["ts_ms"] for r in rows] == [2_000 * i for i in range(len(rows))]
        assert all(r["meta"]["fps"] in (24, 25, 30) for r in rows)
        # frames are bytes derived deterministically per (content, idx)
        assert len({bytes(r["frame"]) for r in rows}) == len(rows)
    again = M.sample_frames(blobs, every_ms=2_000, max_frames=4).collect()
    assert sorted((r["id"], r["frame_idx"], bytes(r["frame"])) for r in again) == sorted(
        (r["id"], r["frame_idx"], bytes(r["frame"])) for r in frames
    )


def test_chunk_audio_windows_align(spark):
    from etl_instagram_spark.multimodal import media as M

    blobs = spark.createDataFrame([("a1", b"audio-bytes-xyz")], "id string, content binary")
    chunks = M.chunk_audio(blobs, chunk_ms=5_000, max_chunks=8).collect()
    assert chunks
    dur = chunks[0]["meta"]["duration_ms"]
    for i, r in enumerate(chunks):
        assert r["chunk_idx"] == i
        assert r["start_ms"] == 5_000 * i
        assert r["end_ms"] == min(5_000 * (i + 1), dur)
        assert len(bytes(r["samples"])) == 64
    assert chunks[-1]["end_ms"] == min(dur, chunks[-1]["end_ms"])


def test_real_codecs_gated_behind_import(spark):
    import pytest as _pytest

    from etl_instagram_spark.multimodal import media as M

    blobs = spark.createDataFrame([("v", b"x")], "id string, content binary")
    with _pytest.raises(NotImplementedError):
        M.sample_frames(blobs, decoder="av")
    with _pytest.raises(NotImplementedError):
        M.chunk_audio(blobs, decoder="soundfile")
    # no real decode exists: ANY non-fake decoder must raise — an
    # unrecognized string must never silently yield synthesized frames
    with _pytest.raises(ValueError, match="unknown decoder"):
        M.sample_frames(blobs, decoder="ffmpeg")
    with _pytest.raises(ValueError, match="unknown decoder"):
        M.chunk_audio(blobs, decoder="av")
