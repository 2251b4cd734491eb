"""URL normalization / host rollup (crawl-pipeline operators)."""

import duckdb
import pytest

from typhoon_ocr_spark.functions.textsql import URL_PARTS_PATTERN
from typhoon_ocr_spark.operators import weburl

TRICKY = [
    "https://Example.COM/path/Page?b=2&a=1#frag",
    "http://www.site.test:80/",
    "https://host.test:443/x",
    "https://host.test:8443/x",
    "http://plain.test",
    "https://www.deep.sub.test/a/b/c?q=1",
    "ftp://files.test:21/pub",
    "no-scheme.example/path",  # malformed: must yield NULLs, not ':///'
]

EXPECTED = {
    "https://Example.COM/path/Page?b=2&a=1#frag": (
        "https://example.com/path/Page?b=2&a=1", "example.com"),
    "http://www.site.test:80/": ("http://site.test/", "site.test"),
    "https://host.test:443/x": ("https://host.test/x", "host.test"),
    "https://host.test:8443/x": ("https://host.test:8443/x", "host.test:8443"),
    "http://plain.test": ("http://plain.test/", "plain.test"),
    "https://www.deep.sub.test/a/b/c?q=1": (
        "https://deep.sub.test/a/b/c?q=1", "deep.sub.test"),
    "ftp://files.test:21/pub": ("ftp://files.test:21/pub", "files.test:21"),
    "no-scheme.example/path": (None, None),
}


def test_normalization_rules(spark):
    df = spark.createDataFrame([(u,) for u in TRICKY], "url string")
    got = {r["url"]: (r["norm_url"], r["host"]) for r in weburl.url_normalize(df).collect()}
    assert got == EXPECTED


def test_duckdb_twin_agrees_on_tricky_urls(spark):
    """The regex constants must behave identically in Java regex
    (Spark) and RE2 (DuckDB) — checked on the edge cases, not just the
    uniform fixture corpus."""
    df = spark.createDataFrame([(u,) for u in TRICKY], "url string")
    s = {r["url"]: (r["norm_url"], r["host"]) for r in weburl.url_normalize(df).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE urls(url VARCHAR)")
    con.executemany("INSERT INTO urls VALUES (?)", [(u,) for u in TRICKY])
    rows = con.sql(
        "WITH u AS (SELECT url, "
        f"lower(regexp_extract(url, '{URL_PARTS_PATTERN}', 1)) AS scheme, "
        f"regexp_replace(lower(regexp_extract(url, '{URL_PARTS_PATTERN}', 2)), "
        "'^www\\.', '') AS host_nw, "
        f"regexp_extract(url, '{URL_PARTS_PATTERN}', 3) AS path, "
        f"regexp_extract(url, '{URL_PARTS_PATTERN}', 4) AS query "
        "FROM urls), "
        "h AS (SELECT url, scheme, "
        "CASE WHEN scheme = '' THEN NULL "
        " WHEN scheme = 'http' THEN regexp_replace(host_nw, ':80$', '') "
        " WHEN scheme = 'https' THEN regexp_replace(host_nw, ':443$', '') "
        " ELSE host_nw END AS host, "
        "CASE WHEN path = '' THEN '/' ELSE path END AS path, query FROM u) "
        "SELECT url, CASE WHEN scheme = '' THEN NULL ELSE "
        "scheme || '://' || host || path || query END AS norm_url, host FROM h"
    ).fetchall()
    d = {u: (n, h) for u, n, h in rows}
    assert s == d


def test_host_rollup(spark):
    rows = [("https://a.test/1",), ("https://a.test/2",), ("https://a.test/2",),
            ("http://www.b.test/x",), ("garbage-without-scheme",)]
    df = spark.createDataFrame(rows, "url string")
    got = {r["host"]: (r["n_pages"], r["n_urls"]) for r in weburl.host_rollup(df).collect()}
    assert got == {"a.test": (3, 2), "b.test": (1, 1)}


def test_url_dedup_collapses_canonical_variants(spark):
    from typhoon_ocr_spark.operators.weburl import url_dedup

    rows = [
        ("https://Example.com/a",),
        ("HTTPS://www.example.com/a#frag",),
        ("https://example.com:443/a",),
        ("https://example.com/a?q=1",),   # query kept -> distinct page
        ("not a url at all",),            # NULL canonical -> excluded
    ]
    df = spark.createDataFrame(rows, "url string")
    got = {r["norm_url"]: r.asDict() for r in url_dedup(df).collect()}
    assert set(got) == {"https://example.com/a", "https://example.com/a?q=1"}
    base = got["https://example.com/a"]
    assert base["dup_count"] == 3
    # keeper is the lexicographic min RAW url of the group
    assert base["keeper_url"] == "HTTPS://www.example.com/a#frag"
    assert got["https://example.com/a?q=1"]["dup_count"] == 1
