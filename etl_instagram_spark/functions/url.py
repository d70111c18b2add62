"""URL canonicalization for crawl-pipeline dedup.

Engine extension (training-data brief): URL-keyed dedup across crawl
snapshots only works if the key is CANONICAL — the same resource
otherwise survives under `HTTP://Host/a?utm_source=x#frag` and
`http://host/a`. The rules here are the standard safe subset (RFC 3986
§6 syntax-based normalization plus tracking-parameter stripping as
crawler practice):

1. drop the fragment;
2. lowercase the scheme and host (path/query stay case-sensitive);
3. drop default ports (``:80`` for http, ``:443`` for https);
4. drop tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``ref``) and SORT the survivors (param order is not
   semantic);
5. drop a bare trailing ``?``.

Everything is built-in string/array expressions (regexp_replace, split,
filter, array_sort, array_join) — codegen'd per row, no UDF, and each
rule is replayable in ANSI SQL with RE2-safe patterns (no lookarounds).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PARAM_REGEX = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)="


def canonicalize_url(col: Column) -> Column:
    # 1. fragment off first so later regexes never see it
    u = F.regexp_replace(col, "#.*$", "")
    # 2. lowercase scheme://host[:port] (group 1), keep the rest verbatim
    head = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)", 1))
    tail = F.regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", "")
    # 3. default ports — scheme-conditional ONLY: https on port 80 is a
    # DIFFERENT resource than https on 443 and must keep its port
    head = F.when(head.startswith("https://"), F.regexp_replace(head, ":443$", "")).otherwise(
        F.regexp_replace(head, ":80$", "")
    )
    # 4. query cleanup: split off '?', filter tracking params, sort, rejoin
    path = F.regexp_replace(tail, r"\?.*$", "")
    query = F.when(tail.contains("?"), F.regexp_replace(tail, r"^[^?]*\?", "")).otherwise(
        F.lit(None).cast("string")
    )
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_REGEX),
        )
    )
    rebuilt_query = F.when(
        query.isNull() | (F.size(params) == 0), F.lit("")
    ).otherwise(F.concat(F.lit("?"), F.array_join(params, "&")))
    return F.concat(head, path, rebuilt_query)


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB mirror, rule for rule (RE2 syntax; list_sort default is
    ascending NULLS-last over non-null strings — same order as Spark's
    array_sort on a no-null array)."""
    u = f"regexp_replace({expr}, '#.*$', '')"
    head = (
        f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)', 1))"
    )
    head = (
        f"CASE WHEN {head} LIKE 'https://%' THEN regexp_replace({head}, ':443$', '') "
        f"ELSE regexp_replace({head}, ':80$', '') END"
    )
    tail = f"regexp_replace({u}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*', '')"
    path = f"regexp_replace({tail}, '\\?.*$', '')"
    query = (
        f"CASE WHEN contains({tail}, '?') "
        f"THEN regexp_replace({tail}, '^[^?]*\\?', '') ELSE NULL END"
    )
    params = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_REGEX}')))"
    )
    rebuilt = (
        f"CASE WHEN {query} IS NULL OR len({params}) = 0 THEN '' "
        f"ELSE '?' || array_to_string({params}, '&') END"
    )
    return f"({head} || {path} || {rebuilt})"
