"""Page-metadata extraction for fetched web documents: OpenGraph/canonical
tags, soft-404 detection, and sitemap parsing.  All pure Column work —
map-only, zero shuffle, zero Python — the same altitude as ops/charset.py
and ops/html.extract_publish_date (the cheap per-page passes that run
inside the ingest scan stage before any shuffle-bearing operator).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OG_RE = (
    r"""(?is)<meta[^>]*property\s*=\s*["']og:{name}["'][^>]*"""
    r"""content\s*=\s*["']([^"']*)["']"""
)
_CANONICAL_RE = (
    r"""(?is)<link[^>]*rel\s*=\s*["']canonical["'][^>]*"""
    r"""href\s*=\s*["']([^"']*)["']"""
)


def _og(html: Column, name: str) -> Column:
    return F.nullif(
        F.regexp_extract(html, _OG_RE.format(name=name), 1), F.lit("")
    )


def extract_opengraph(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Adds (og_title, og_description, og_image, og_type, canonical_url):
    the OpenGraph protocol tags + the rel=canonical link — the metadata
    block every serious page-dedup/preview pipeline reads before touching
    body text (canonical_url feeds URL-level dedup; og_image feeds the
    media pipeline).  NULL where a tag is absent."""
    html = F.col(html_col)
    return df.select(
        "*",
        _og(html, "title").alias("og_title"),
        _og(html, "description").alias("og_description"),
        _og(html, "image").alias("og_image"),
        _og(html, "type").alias("og_type"),
        F.nullif(F.regexp_extract(html, _CANONICAL_RE, 1), F.lit(""))
        .alias("canonical_url"),
    )


_ERR_TITLE_RE = (
    r"(?is)<title[^>]*>[^<]*(404|not\s+found|page\s+unavailable|"
    r"does\s+not\s+exist|error)[^<]*</title>"
)
_ERR_BODY_RE = (
    r"(?is)(page\s+(?:you\s+requested\s+)?(?:was\s+)?not\s+found|"
    r"no\s+longer\s+available|has\s+been\s+(?:removed|deleted)|"
    r"404\s+error)"
)


def soft404_detect(
    df: DataFrame, html_col: str = "html", min_words: int = 30
) -> DataFrame:
    """Adds (title_404, body_404, n_words, soft404): heuristic detection of
    error pages served with HTTP 200 — the crawl-corpus poison that status
    filtering cannot catch.  A page is soft-404 when its <title> carries an
    error phrase, or its visible text is both short (< ``min_words``) and
    contains an error phrase.  (The two-signal rule keeps a long article
    that merely MENTIONS '404 error' out of the trash.)"""
    html = F.col(html_col)
    title_hit = F.regexp_like(
        F.coalesce(html, F.lit("")), F.lit(_ERR_TITLE_RE)
    )
    body_txt = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.coalesce(html, F.lit("")), r"(?is)<[^>]*>", " "),
            r"\s+", " ",
        )
    )
    n_words = F.when(body_txt == "", 0).otherwise(
        F.size(F.split(body_txt, " "))
    ).cast("int")
    body_hit = F.regexp_like(body_txt, F.lit(_ERR_BODY_RE))
    soft = title_hit | (body_hit & (n_words < min_words))
    return df.select(
        "*",
        title_hit.alias("title_404"),
        body_hit.alias("body_404"),
        n_words.alias("n_words"),
        soft.alias("soft404"),
    )


_URL_BLOCK_RE = r"(?is)<url>.*?</url>"
_SITEMAP_BLOCK_RE = r"(?is)<sitemap>.*?</sitemap>"


def _tag(block: Column, tag: str) -> Column:
    return F.nullif(
        F.regexp_extract(block, rf"(?is)<{tag}>\s*([^<]*?)\s*</{tag}>", 1),
        F.lit(""),
    )


def parse_sitemap(
    df: DataFrame, xml_col: str = "xml", key_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Sitemap XML → one row per entry: (…key_cols, entry_no, kind, loc,
    lastmod, priority).  Handles both <urlset> leaves (kind='url') and
    <sitemapindex> indirection (kind='sitemap' — the crawl scheduler
    follows those to more sitemaps).  Entry extraction is
    ``regexp_extract_all`` over the block pattern + posexplode; per-block
    fields are anchored extracts, so a missing <lastmod> is NULL, never a
    cross-entry bleed.  Map-only — parallelism is the input's."""
    xml = F.coalesce(F.col(xml_col), F.lit(""))
    blocks = F.concat(
        F.regexp_extract_all(xml, F.lit(_URL_BLOCK_RE), 0),
        F.regexp_extract_all(xml, F.lit(_SITEMAP_BLOCK_RE), 0),
    )
    out = df.select(
        *key_cols, F.posexplode_outer(blocks).alias("entry_no", "block")
    )
    b = F.col("block")
    return out.select(
        *key_cols,
        F.col("entry_no").cast("int").alias("entry_no"),
        F.when(b.isNull(), None)
        .when(F.lower(b).startswith("<sitemap"), "sitemap")
        .otherwise("url")
        .alias("kind"),
        _tag(b, "loc").alias("loc"),
        _tag(b, "lastmod").alias("lastmod"),
        _tag(b, "priority").alias("priority"),
    )


_ITEM_BLOCK_RE = r"(?is)<item(?=[\s>])[^>]*>.*?</item>"
_ENTRY_BLOCK_RE = r"(?is)<entry(?=[\s>])[^>]*>.*?</entry>"
_ATOM_HREF_RE = r"""(?is)<link[^>]*href\s*=\s*["']([^"']*)["']"""


def parse_feed(
    df: DataFrame, xml_col: str = "xml", key_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """RSS/Atom feed XML → one row per entry: (…key_cols, entry_no, kind,
    title, link, published).  RSS ``<item>`` blocks report kind='rss'
    (``<link>text</link>``, ``<pubDate>``); Atom ``<entry>`` blocks report
    kind='atom' (``<link href=…/>``, ``<published>``/``<updated>``).
    Non-feed documents keep one NULL-kind row (posexplode_outer — same
    accounting contract as :func:`parse_sitemap`).  Map-only."""
    xml = F.coalesce(F.col(xml_col), F.lit(""))
    blocks = F.concat(
        F.regexp_extract_all(xml, F.lit(_ITEM_BLOCK_RE), 0),
        F.regexp_extract_all(xml, F.lit(_ENTRY_BLOCK_RE), 0),
    )
    out = df.select(
        *key_cols, F.posexplode_outer(blocks).alias("entry_no", "block")
    )
    b = F.col("block")
    is_atom = F.lower(b).startswith("<entry")
    link = F.when(
        is_atom, F.nullif(F.regexp_extract(b, _ATOM_HREF_RE, 1), F.lit(""))
    ).otherwise(_tag(b, "link"))
    published = F.coalesce(
        _tag(b, "pubDate"), _tag(b, "published"), _tag(b, "updated")
    )
    return out.select(
        *key_cols,
        F.col("entry_no").cast("int").alias("entry_no"),
        F.when(b.isNull(), None).when(is_atom, "atom").otherwise("rss")
        .alias("kind"),
        _tag(b, "title").alias("title"),
        link.alias("link"),
        published.alias("published"),
    )
