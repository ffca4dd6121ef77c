"""HTML main-content extraction: boilerplate strip + block heuristics.

The north rule's extraction triad is "HTML boilerplate strip, PDF/layout
parse, DOM heuristics" — PDF/layout lives in ``extract.py``/``media.py``;
this module is the HTML leg, built as pure Column expressions (JVM-side,
WholeStageCodegen, zero Python) in the jusText/readability tradition:

1. kill non-content subtrees wholesale (``script style nav header footer
   aside`` — the DOM regions that are boilerplate by construction);
2. segment what remains into block-level units (p/div/h*/li/td/br
   boundaries — the flat-text analogue of DOM block nodes);
3. score each block: visible-text length and LINK DENSITY (share of the
   block's text inside <a> anchors — the single most effective
   main-vs-chrome discriminator in the readability literature);
4. keep blocks that are long enough and not link-dominated; join in
   document order; unescape the basic entities.

Everything is deterministic regex/HOF work, so the DuckDB oracle reproduces
it bit-for-bit and the driver value-checks the whole pipeline.  At corpus
scale the op is a pure map (no shuffle, pushes behind scans); a giant page
costs O(page bytes) like any other row — page-size capping upstream is the
skew control, same as the PDF path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: subtrees removed wholesale before block segmentation (head first: title
#: is extracted separately from the raw html, the rest of head is metadata)
BOILERPLATE_TAGS = ("head", "script", "style", "nav", "header", "footer", "aside")

#: tags treated as block boundaries
_BLOCK_TAG_RE = r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|br)[^>]*>"

_SEP = "\x1e"  # record separator: never appears in text


def strip_boilerplate(html: Column) -> Column:
    for t in BOILERPLATE_TAGS:
        html = F.regexp_replace(html, f"(?is)<{t}[^>]*>.*?</{t}>", " ")
    return html


def strip_tags(s: Column) -> Column:
    return F.regexp_replace(s, r"<[^>]*>", " ")


def unescape_entities(s: Column) -> Column:
    # &amp; LAST so '&amp;lt;' round-trips to '&lt;' on both engines
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return s


def _norm_ws(s: Column) -> Column:
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def extract_title(html: Column) -> Column:
    return _norm_ws(F.regexp_extract(html, r"(?is)<title[^>]*>(.*?)</title>", 1))


def html_main_content(
    docs: DataFrame,
    html_col: str = "html",
    min_block_chars: int = 20,
    max_link_density: float = 0.5,
) -> DataFrame:
    """(doc_id, title, main_text, n_kept, n_dropped): jusText-style
    main-content extraction over an HTML string column.  ``main_text`` is
    the kept blocks joined by '\\n' in document order."""
    # NULL pages behave as empty pages (empty outputs, zero counts) rather
    # than poisoning every downstream column with NULL
    html = F.coalesce(F.col(html_col), F.lit(""))
    body = strip_boilerplate(html)

    # block segmentation: block tags become separators, then split
    blocks_raw = F.split(
        F.regexp_replace(body, _BLOCK_TAG_RE, _SEP), _SEP
    )

    def link_text_len(b: Column) -> Column:
        # total visible chars inside <a> anchors of this block
        return F.aggregate(
            F.regexp_extract_all(b, F.lit(r"(?is)<a[^>]*>(.*?)</a>"), F.lit(1)),
            F.lit(0),
            lambda acc, a: acc + F.length(_norm_ws(strip_tags(a))),
        )

    scored = F.transform(
        blocks_raw,
        lambda b: F.struct(
            _norm_ws(unescape_entities(strip_tags(b))).alias("text"),
            link_text_len(b).alias("link_len"),
        ),
    )
    kept = F.filter(
        scored,
        lambda s: (F.length(s["text"]) >= min_block_chars)
        & (
            s["link_len"]
            <= F.greatest(F.length(s["text"]), F.lit(1)) * max_link_density
        ),
    )
    n_total = F.size(F.filter(scored, lambda s: F.length(s["text"]) > 0))

    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        extract_title(html).alias("title"),
        F.array_join(F.transform(kept, lambda s: s["text"]), "\n").alias("main_text"),
        F.size(kept).cast("int").alias("n_kept"),
        (n_total - F.size(kept)).cast("int").alias("n_dropped"),
    )
