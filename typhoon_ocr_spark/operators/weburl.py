"""URL normalization + host-level rollups — crawl-pipeline operators.

A Common-Crawl-scale ingest dedupes and shards by URL constantly;
canonicalization is the step before every url-keyed join. Pure column
expressions (JVM regexp, whole-stage codegen); the DuckDB oracle twin
uses the same regex constants from functions/textsql so the engines
cannot drift.

Normalization rules (deterministic, order matters):
1. scheme and host lowercase;
2. leading ``www.`` stripped from the host;
3. default ports dropped (``:80`` for http, ``:443`` for https);
4. fragment dropped;
5. empty path becomes ``/``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textsql import URL_PARTS_PATTERN


def _part(col: Column, group: int) -> Column:
    return F.regexp_extract(col, URL_PARTS_PATTERN, group)


def normalized_url_col(col: Column) -> Column:
    """Canonical URL as one JVM expression (rules in module doc).
    URLs that don't match the splitter (no scheme, malformed) yield
    NULL — never a garbage ':///' that would silently collapse every
    malformed URL into one value."""
    scheme = F.lower(_part(col, 1))
    host_raw = F.lower(_part(col, 2))
    host_nw = F.regexp_replace(host_raw, r"^www\.", "")
    # strip default port per scheme
    host = (
        F.when((scheme == "http"), F.regexp_replace(host_nw, ":80$", ""))
        .when((scheme == "https"), F.regexp_replace(host_nw, ":443$", ""))
        .otherwise(host_nw)
    )
    path = _part(col, 3)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = _part(col, 4)  # keeps the leading '?', empty string if none
    norm = F.concat(scheme, F.lit("://"), host, path, query)
    return F.when(scheme != "", norm)


def host_col(col: Column) -> Column:
    """Canonical host (lowercased, www- and default-port-stripped);
    NULL for URLs the splitter can't parse."""
    scheme = F.lower(_part(col, 1))
    host_nw = F.regexp_replace(F.lower(_part(col, 2)), r"^www\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host_nw, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host_nw, ":443$", ""))
        .otherwise(host_nw)
    )
    return F.when(scheme != "", host)


def url_normalize(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, norm_url, host) per input row."""
    c = F.col(url_col)
    return pages.select(
        c.alias("url"),
        normalized_url_col(c).alias("norm_url"),
        host_col(c).alias("host"),
    )


def url_dedup(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Crawl-level exact dedup by canonical URL — the first pass every
    recrawl pipeline runs (the same page arrives as http/https, with
    and without www., with fragments). One shuffle on norm_url with
    map-side partial agg; keeper = lexicographic min raw url (ties
    broken deterministically). Unparseable URLs (NULL canonical) are
    excluded. Output: (norm_url, dup_count, keeper_url)."""
    c = F.col(url_col)
    return (
        pages.select(normalized_url_col(c).alias("norm_url"), c.alias("url"))
        .filter(F.col("norm_url").isNotNull())
        .groupBy("norm_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("dup_count"),
            F.min("url").alias("keeper_url"),
        )
    )


def host_rollup(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Pages per canonical host — the shard/politeness histogram every
    crawl pipeline starts from. Unparseable URLs (NULL host) are
    excluded rather than aggregated into a fake '' host. One shuffle on
    the host key, map-side partial agg. Output: (host, n_pages, n_urls)."""
    c = F.col(url_col)
    return (
        pages.select(host_col(c).alias("host"), c.alias("url"))
        .filter(F.col("host").isNotNull())
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("url").alias("n_urls"),
        )
    )
