"""URL/domain blocklist filtering — the first gate of every web-corpus
curation pipeline (UT1-blocklist / CCNet-style): drop documents whose URL
host falls under a blocked registrable domain (subdomains included) or
whose URL contains a banned keyword.

Scale shape: real blocklists hold millions of domains, so membership is a
JOIN, never a regex alternation.  Subdomain semantics ("anything under
badsite.com") become an equi-join by exploding each host into its
dot-suffix chain (bounded by label count, ~5 rows per doc) and joining
suffixes against the blocklist — AQE picks broadcast vs shuffle by
blocklist size.  Keyword rules are a handful of literal substrings —
map-only `contains` checks, engine-portable to the DuckDB oracle.

No counterpart in the reference (extraction-focused); part of the
beyond-reference curation suite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def url_host(url: Column) -> Column:
    """lowercased host of a URL, port stripped; '' when not URL-shaped."""
    host = F.lower(
        F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    )
    return F.regexp_replace(host, r":\d+$", "")


def host_suffixes(host: Column) -> Column:
    """['a.b.c.com', 'b.c.com', 'c.com', 'com'] — every dot-suffix, so
    subdomain blocking is one equi-join on the exploded chain."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(parts, i + 1, n - i), "."),
    )


def url_filter(
    docs: DataFrame,
    blocklist: DataFrame,
    keywords: list[str] = (),
    url_col: str = "url",
) -> DataFrame:
    """(doc_id, url, host, blocked_domain, keyword_hit, keep) per doc.

    ``blocklist`` must have a ``domain`` column; a host is blocked when any
    of its dot-suffixes equals a blocklist domain, and ``blocked_domain``
    reports the most specific (longest) match.  ``keyword_hit`` is the
    first configured keyword (in list order) contained in the lowercased
    URL.  ``keep`` is true iff neither rule fired."""
    url = F.col(url_col)
    lower_url = F.lower(url)
    kw_hit = F.lit(None).cast("string")
    # lowercase the keywords too — they are matched against the lowercased
    # URL, so a caller passing 'Casino' would otherwise silently never match
    for kw in reversed([k.lower() for k in keywords]):
        kw_hit = F.when(lower_url.contains(kw), F.lit(kw)).otherwise(kw_hit)

    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        url.alias("url"),
        url_host(url).alias("host"),
        kw_hit.alias("keyword_hit"),
    )
    cand = base.select(
        "doc_id", F.explode(host_suffixes(F.col("host"))).alias("suffix")
    )
    blocked = (
        cand.join(
            blocklist.select(F.lower("domain").alias("suffix")).distinct(),
            "suffix",
            "inner",
        )
        .groupBy("doc_id")
        .agg(F.max_by("suffix", F.length("suffix")).alias("blocked_domain"))
    )
    return base.join(blocked, "doc_id", "left").select(
        "doc_id",
        "url",
        "host",
        "blocked_domain",
        "keyword_hit",
        (F.col("blocked_domain").isNull() & F.col("keyword_hit").isNull()).alias(
            "keep"
        ),
    )
