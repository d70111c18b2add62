"""Tests for the news/rates/followers pipelines and multimodal plumbing
(FIXTURES.md §1.6/§4 merge-semantics fixtures)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from etl_instagram_spark.multimodal import images as M
from etl_instagram_spark.operators.merge import MergeTable
from etl_instagram_spark.pipelines.followers import run_follower_batch, select_followers_to_enrich
from etl_instagram_spark.pipelines.news import run_news_batch
from etl_instagram_spark.pipelines.rates import daily_rate_averages, latest_rate_per_entity, run_rates_batch
from etl_instagram_spark.sources import schemas as S

T1 = datetime(2021, 3, 1, tzinfo=timezone.utc)
T2 = datetime(2021, 3, 2, tzinfo=timezone.utc)


def test_news_pipeline_url_dedup(spark, tmp_path):
    table = MergeTable(spark, str(tmp_path / "news"), "url")
    b1 = spark.createDataFrame(
        [("T1", "https://n.mx/a1", "/img/1.jpg", ["p1"]), ("T2", "https://n.mx/a2", None, ["p2"])],
        S.RAW_NEWS_ITEMS,
    )
    assert run_news_batch(spark, b1, table, origin="https://n.mx", batch_ts=T1) == 2

    # second batch: one known url (skipped, J5) + one new
    b2 = spark.createDataFrame(
        [("T1-changed", "https://n.mx/a1", None, ["px"]), ("T3", "https://n.mx/a3", None, ["p3"])],
        S.RAW_NEWS_ITEMS,
    )
    assert run_news_batch(spark, b2, table, origin="https://n.mx", batch_ts=T2) == 1
    rows = {r["url"]: r for r in table.read().collect()}
    assert set(rows) == {"https://n.mx/a1", "https://n.mx/a2", "https://n.mx/a3"}
    assert rows["https://n.mx/a1"]["title"] == "T1"  # not re-ingested
    assert rows["https://n.mx/a1"]["image"] == "https://n.mx/img/1.jpg"


def test_rates_pipeline_append_and_timeseries(spark, tmp_path):
    table = MergeTable(spark, str(tmp_path / "rates"), "entity", order_by="created_at")
    rows1 = spark.createDataFrame(
        [("BankA", "//a.mx", "19.5", "19.9"), ("BankB", "//b.mx", "20.0", None)], S.RAW_RATE_ROWS
    )
    rows2 = spark.createDataFrame(
        [("BankA", "//a.mx", "19.7", "20.1"), ("BankB", "//b.mx", "20.2", "20.4")], S.RAW_RATE_ROWS
    )
    assert run_rates_batch(spark, rows1, table, batch_ts=T1) == 2
    assert run_rates_batch(spark, rows2, table, batch_ts=T2) == 2
    rates = table.read()
    assert rates.count() == 4  # append-only: both snapshots retained

    latest = {r["entity"]: r for r in latest_rate_per_entity(rates).collect()}
    assert latest["BankA"]["buy"] == 19.7 and latest["BankA"]["created_at"].day == 2
    assert latest["BankB"]["sell"] == 20.4

    daily = daily_rate_averages(rates).collect()
    by_key = {(r["entity"], r["day"].isoformat()): r for r in daily}
    assert by_key[("BankA", "2021-03-01")]["avg_buy"] == 19.5
    assert by_key[("BankB", "2021-03-01")]["avg_spread"] == 0.0  # sell fell back to buy


def follower_row(username, biography=None, updated="2021-01-01T00:00:00"):
    return (username, biography, datetime.fromisoformat(updated))


def test_follower_pipeline_partial_upsert_and_delete(spark, tmp_path):
    table = MergeTable(spark, str(tmp_path / "followers"), "username")
    seed = spark.createDataFrame(
        [follower_row("alice"), follower_row("bob", updated="2021-01-02T00:00:00"),
         follower_row("carol", "already enriched")],
        "username string, biography string, updated_at timestamp",
    )
    table.overwrite(seed)

    # S11: only unenriched, newest first
    picked = [r["username"] for r in select_followers_to_enrich(table.read(), limit=2).collect()]
    assert picked == ["bob", "alice"]

    from tests.test_ingest import parse

    profiles = parse(
        spark,
        [{
            "username": "alice",
            "graphql": {"user": {
                "biography": "painter", "category_name": "Artist",
                "business_category_name": None,
                "is_business_account": False, "is_professional_account": False,
                "is_verified": True,
                "edge_follow": {"count": 5}, "edge_followed_by": {"count": 50},
                "edge_owner_to_timeline_media": {"count": 1, "edges": []},
            }},
        }],
        S.RAW_PROFILE_PAGE,
    )
    gone = spark.createDataFrame([("bob",)], "username string")
    stats = run_follower_batch(spark, profiles, gone, table)
    assert stats == {"enriched": 1, "deleted": 1}

    rows = {r["username"]: r for r in table.read().collect()}
    assert set(rows) == {"alice", "carol"}  # bob tombstoned (W7)
    assert rows["alice"]["biography"] == "painter"
    assert rows["alice"]["is_verified"] is True
    assert rows["alice"]["updated_at"] is not None  # old field preserved (W3)
    assert rows["carol"]["biography"] == "already enriched"


def test_multimodal_blobs_decode_and_features(spark):
    posts = spark.createDataFrame(
        [("p1", bytearray(b"\x89PNG-ish bytes 1")), ("p2", bytearray(b"JPEG-ish bytes 2")),
         ("p3", None)],
        "id string, content binary",
    )
    blobs = M.blobs_from_posts(posts, content_col="content")
    assert blobs.count() == 2  # null content dropped

    decoded = {r["id"]: r["meta"] for r in M.decode_images(blobs, decoder="fake").collect()}
    assert all(m["width"] >= 64 and m["format"] in ("jpeg", "png", "webp") for m in decoded.values())
    again = {r["id"]: r["meta"] for r in M.decode_images(blobs, decoder="fake").collect()}
    assert decoded == again  # deterministic stub

    feats = M.image_features(blobs, dim=8).collect()
    assert all(len(r["embedding"]) == 8 for r in feats)
    assert all(-1.0 <= v <= 1.0 for r in feats for v in r["embedding"])


def test_png_codec_roundtrip_every_filter_and_colortype():
    """decode_png must invert encode_png for every scanline filter
    (0=None/1=Sub/2=Up/3=Average/4=Paeth) and every supported color
    type — the unfilter arithmetic is the decoder's only hard part, so
    each path gets exercised explicitly on a deterministic gradient."""
    from etl_instagram_spark.multimodal.png import decode_png, encode_png

    w, h = 9, 7
    for channels in (1, 2, 3, 4):
        px = bytes(
            (x * 31 + y * 17 + c * 7) % 256
            for y in range(h)
            for x in range(w)
            for c in range(channels)
        )
        for ftype in range(5):
            blob = encode_png(w, h, px, channels=channels, filter_type=ftype)
            out = decode_png(blob)
            assert (out["width"], out["height"], out["channels"]) == (w, h, channels)
            assert out["pixels"] == px, (channels, ftype)


def test_png_decoder_rejects_unsupported_and_garbage():
    from etl_instagram_spark.multimodal.png import decode_png

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")
    with pytest.raises(TypeError):
        decode_png("not-bytes")


def test_multimodal_png_decoder_reads_real_dimensions(spark):
    """The 'png' decoder fills meta from the PIXELS, not a hash: decode
    two differently-sized real PNGs through the mapInPandas path and
    check the exact dimensions come back; a JPEG-ish blob raises through
    the Arrow boundary rather than producing fake metadata."""
    from etl_instagram_spark.multimodal.png import encode_png

    png_a = encode_png(12, 5, bytes(12 * 5 * 3), channels=3)
    png_b = encode_png(3, 8, bytes(range(3 * 8 * 4)), channels=4, filter_type=4)
    posts = spark.createDataFrame(
        [("a", bytearray(png_a)), ("b", bytearray(png_b))],
        "id string, content binary",
    )
    blobs = M.blobs_from_posts(posts, content_col="content")
    got = {
        r["id"]: r["meta"]
        for r in M.decode_images(blobs, decoder="png").collect()
    }
    dims = {(m["width"], m["height"], m["format"]) for m in got.values()}
    assert dims == {(12, 5, "png"), (3, 8, "png")}

    bad = M.blobs_from_posts(
        spark.createDataFrame([("j", bytearray(b"JFIF..."))], "id string, content binary"),
        content_col="content",
    )
    with pytest.raises(Exception, match="signature"):
        M.decode_images(bad, decoder="png").collect()


def test_multimodal_pil_decoder_gated(spark):
    posts = spark.createDataFrame([("p1", bytearray(b"x"))], "id string, content binary")
    blobs = M.blobs_from_posts(posts)
    if not M._pil_available():
        with pytest.raises(NotImplementedError):
            M.decode_images(blobs, decoder="pil")
