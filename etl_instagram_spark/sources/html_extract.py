"""DOM extraction as a table-valued pandas UDF surface (S7/S8/S9,
SURVEY §2.10 "HTML → rows").

The reference extracts rows from rendered pages with querySelector loops
(elimparcial.js:27-47 news boxes, :62-96 article body; eldolar.js:17-36
rates table). Selector evaluation is not a Catalyst-native op, so this is
the sanctioned Python boundary: parse each page with the stdlib
``html.parser`` (no external deps), emit ``array<struct>`` rows, then
``explode`` — one scan, one Python pass per page, no shuffle.

Scale notes: parsing is per-row CPU inside ``mapInPandas`` — linear,
embarrassingly parallel, Arrow-batched. Pages are large strings: keep
``spark.sql.files.maxPartitionBytes`` tight so a partition of raw HTML
fits executor memory.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NEWS_ITEM_DDL = "title string, url string, image string"
ARTICLE_DDL = "title string, image string, paragraphs array<string>"
RATE_ROW_DDL = "entity string, url string, buy string, sell string"


class _NewsBoxParser(HTMLParser):
    """class='news--box' blocks: the row fields live in data-* attributes
    of the box's <button> (elimparcial.js:33-44)."""

    def __init__(self):
        super().__init__()
        self.items: list[dict] = []
        self._in_box = 0

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if "news--box" in (a.get("class") or ""):
            self._in_box += 1
        elif self._in_box and tag == "button":
            self.items.append(
                {
                    "title": a.get("data-title"),
                    "url": a.get("data-url"),
                    "image": a.get("data-image"),
                }
            )

    def handle_endtag(self, tag):
        if tag == "div" and self._in_box:
            self._in_box -= 1


class _ArticleParser(HTMLParser):
    """h1 title + <p> paragraph collect + first content <img>
    (elimparcial.js:62-96)."""

    def __init__(self):
        super().__init__()
        self.title: str | None = None
        self.image: str | None = None
        self.paragraphs: list[str] = []
        self._tag: str | None = None
        self._buf: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in ("h1", "p"):
            self._tag = tag
            self._buf = []
        elif tag == "img" and self.image is None:
            self.image = dict(attrs).get("src")

    def handle_data(self, data):
        if self._tag:
            self._buf.append(data)

    def handle_endtag(self, tag):
        if tag == self._tag:
            text = "".join(self._buf).strip()
            if tag == "h1" and self.title is None:
                self.title = text
            elif tag == "p" and text:
                self.paragraphs.append(text)
            self._tag = None


class _RatesTableParser(HTMLParser):
    """#dllsTable rows: <a title> entity/url, two .xTimes cells buy/sell
    (eldolar.js:17-36; sell may be absent → None, fallback applied by
    the P9 projection)."""

    def __init__(self):
        super().__init__()
        self.rows: list[dict] = []
        self._in_table = False
        self._row: dict | None = None
        self._in_xtimes = False
        self._buf: list[str] = []

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "table" and a.get("id") == "dllsTable":
            self._in_table = True
        elif self._in_table and tag == "tr":
            self._row = {"entity": None, "url": None, "buy": None, "sell": None}
        elif self._row is not None and tag == "a":
            self._row["entity"] = a.get("title")
            self._row["url"] = a.get("href")
        elif self._row is not None and "xTimes" in (a.get("class") or ""):
            self._in_xtimes = True
            self._buf = []

    def handle_data(self, data):
        if self._in_xtimes:
            self._buf.append(data)

    def handle_endtag(self, tag):
        if self._in_xtimes and tag in ("td", "span"):
            val = "".join(self._buf).strip() or None
            if self._row["buy"] is None:
                self._row["buy"] = val
            elif self._row["sell"] is None:
                self._row["sell"] = val
            self._in_xtimes = False
        elif tag == "tr" and self._row is not None:
            if self._row["entity"] is not None:
                self.rows.append(self._row)
            self._row = None
        elif tag == "table":
            self._in_table = False


def _extract_udtf(pages: DataFrame, html_col: str, parse_one, item_ddl: str, out_col: str) -> DataFrame:
    """Generic HTML→rows: mapInPandas emits an array<struct> per page,
    caller-side explode flattens (keeps the UDF a pure function)."""
    keep = [f.name for f in pages.schema.fields if f.name != html_col]
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in pages.schema.fields if f.name != html_col]
        + [f"{out_col} array<struct<{item_ddl}>>"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[keep].copy()
            out[out_col] = pdf[html_col].map(lambda h: None if h is None else parse_one(h))
            yield out

    return pages.mapInPandas(run, schema=schema)


def _flatten(nested: DataFrame, arr_col: str, item_fields: list[str]) -> DataFrame:
    """Explode the item array; page-level columns that collide with item
    fields are kept under a ``page_`` prefix."""
    page_cols = [c for c in nested.columns if c != arr_col]
    exploded = nested.select(*page_cols, F.explode(arr_col).alias("__item"))
    out_cols = [
        F.col(c).alias(f"page_{c}") if c in item_fields else F.col(c) for c in page_cols
    ]
    out_cols += [F.col(f"__item.{f}").alias(f) for f in item_fields]
    return exploded.select(*out_cols)


def extract_news_items(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """S7: news-list page → one row per news box."""
    def parse_one(html: str) -> list[dict]:
        p = _NewsBoxParser()
        p.feed(html)
        return p.items

    nested = _extract_udtf(pages, html_col, parse_one, NEWS_ITEM_DDL, "items")
    return _flatten(nested, "items", ["title", "url", "image"])


def extract_article(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """S8: article page → (title, image, paragraphs)."""
    def parse_one(html: str) -> dict:
        p = _ArticleParser()
        p.feed(html)
        return {"title": p.title, "image": p.image, "paragraphs": p.paragraphs}

    keep = [f.name for f in pages.schema.fields if f.name != html_col]
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in pages.schema.fields if f.name != html_col]
        + [f"article struct<{ARTICLE_DDL}>"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[keep].copy()
            out["article"] = pdf[html_col].map(lambda h: None if h is None else parse_one(h))
            yield out

    return pages.mapInPandas(run, schema=schema).select(*keep, "article.*")


def extract_rate_rows(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """S9: rates page → one row per bank (strings; P9 casts/falls back)."""
    def parse_one(html: str) -> list[dict]:
        p = _RatesTableParser()
        p.feed(html)
        return p.rows

    nested = _extract_udtf(pages, html_col, parse_one, RATE_ROW_DDL, "rows")
    return _flatten(nested, "rows", ["entity", "url", "buy", "sell"])


def extract_embedded_json(
    pages: DataFrame,
    html_col: str = "html",
    marker: str = "window._sharedData",
    out_col: str = "raw_json",
) -> DataFrame:
    """S3/S4: pull the page-embedded JSON blob (the reference reads
    ``window._sharedData.entry_data...`` after running page scripts in
    JSDOM, posts-from-hashtags.js:111-128; extend-followers.js:43-48).
    The blob sits in a ``<script>`` as ``window._sharedData = {...};`` —
    a JVM-side regexp_extract, no Python, no DOM:

        marker = {json};</script>   →   {json}

    Feed the result to ``sources.tables.parse_json_pages`` with the
    matching raw-shape schema."""
    pattern = re.escape(marker) + r"\s*=\s*(\{.*?\});?\s*</script>"
    return pages.withColumn(out_col, F.regexp_extract(F.col(html_col), pattern, 1))
