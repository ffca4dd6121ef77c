"""Web link-graph operators: anchor extraction, host-graph reduction, and
fixed-iteration integer PageRank — the centrality signal web-corpus
curation pipelines derive from the crawl itself (CC-style host ranking as
a quality prior, seed selection, spam-farm demotion).

Scale shapes:

- :func:`extract_links` is pure Column regex work (codegen, zero Python,
  map-only) — one row per anchor.
- :func:`host_graph` is one keyed agg over (src_host, dst_host).
- :func:`pagerank_hosts` runs a FIXED number of synchronous iterations;
  each iteration is one broadcast-or-shuffle join (ranks ⋈ edges) plus one
  keyed agg — the plan every Spark-native PageRank uses.  Ranks are held
  in INTEGER micro-units with `div` arithmetic, so the result is exact,
  order-free (integer sums commute), partition-invariant, and replayable
  bit-for-bit by unrolling the iterations in the DuckDB oracle — a float
  PageRank would drift across engines and partitionings.  Dangling hosts
  keep only the base term (standard simplification; their mass is not
  redistributed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .urlfilter import url_host

#: anchor tags with a quoted href; group 1 = href, group 2 = inner text
_A_TAG_RE = "(?is)<a[^>]*href\\s*=\\s*[\"']([^\"']*)[\"'][^>]*>(.*?)</a>"

RANK_UNIT = 1_000_000  # micro-units per unit of rank mass


def _norm_anchor(s: Column) -> Column:
    return F.trim(
        F.regexp_replace(F.regexp_replace(s, r"<[^>]*>", " "), r"\s+", " ")
    )


def extract_links(
    pages: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, link_no, href, anchor[, *carry]): every <a href> in
    document order, anchor text tag-stripped and whitespace-normalized.
    Map-only; ``carry`` columns (e.g. the page's own host) ride the explode
    so downstream graph building never needs a join back to pages."""
    pairs = F.regexp_extract_all(
        F.coalesce(F.col(html_col), F.lit("")), F.lit(_A_TAG_RE), F.lit(1)
    )
    texts = F.regexp_extract_all(
        F.coalesce(F.col(html_col), F.lit("")), F.lit(_A_TAG_RE), F.lit(2)
    )
    z = F.arrays_zip(pairs.alias("href"), texts.alias("txt"))
    return (
        pages.select(
            F.col(id_col).cast("long").alias("doc_id"),
            *[F.col(c) for c in carry],
            F.posexplode(z).alias("link_no", "l"),
        )
        .select(
            "doc_id",
            F.col("link_no").cast("int").alias("link_no"),
            F.col("l.href").alias("href"),
            _norm_anchor(F.col("l.txt")).alias("anchor"),
            *[F.col(c) for c in carry],
        )
    )


def host_graph(
    links: DataFrame, src_col: str = "src_host", href_col: str = "href"
) -> DataFrame:
    """(src_host, dst_host, n_links): absolute-URL links aggregated to host
    edges; relative hrefs (no scheme) and self-loops are dropped.  One
    keyed agg (map-side combined)."""
    dst = url_host(F.col(href_col))
    return (
        links.select(F.col(src_col).alias("src_host"), dst.alias("dst_host"))
        .filter((F.col("dst_host") != "") & (F.col("dst_host") != F.col("src_host")))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def anchor_terms(
    links: DataFrame, href_col: str = "href", k: int = 3
) -> DataFrame:
    """(dst_host, term, n, rk): top-k anchor-text terms pointing AT each
    host — the classic off-page relevance/spam signal (what the web says a
    site is about, independent of its own content).

    One keyed agg over (dst_host, term) with map-side combine, then a
    row_number window PARTITIONED BY HOST over the aggregated term counts
    (bounded by a host's distinct anchor vocabulary, not its in-link
    count — a host with 10^9 identical 'click here' in-links contributes
    ONE row to the window).  Ties → term asc."""
    from pyspark.sql.window import Window

    dst = url_host(F.col(href_col))
    terms = (
        links.select(
            dst.alias("dst_host"),
            F.explode(
                F.split(F.lower(F.coalesce(F.col("anchor"), F.lit(""))), " ")
            ).alias("term"),
        )
        .filter((F.col("dst_host") != "") & (F.col("term") != ""))
        .groupBy("dst_host", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("dst_host").orderBy(F.desc("n"), F.asc("term"))
    return (
        terms.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
    )


def pagerank_hosts(
    edges: DataFrame, iters: int = 3, damping_pct: int = 85
) -> DataFrame:
    """(host, rank_micro): fixed-iteration integer PageRank over host
    edges (src_host, dst_host, n_links).

    R_0 = RANK_UNIT per host; per iteration each source splits
    ``R div outw`` per LINK (outw = Σ n_links out), and
    ``R_{k+1}(h) = base + (Σ inflow * damping_pct) div 100`` with
    ``base = (100-damping_pct)% of RANK_UNIT``.  All int64; `div`
    truncation makes every engine and partitioning agree exactly."""
    hosts = (
        edges.select(F.col("src_host").alias("host"))
        .union(edges.select("dst_host"))
        .distinct()
    )
    outw = edges.groupBy("src_host").agg(F.sum("n_links").alias("outw"))
    base = (100 - damping_pct) * RANK_UNIT // 100
    ranks = hosts.select("host", F.lit(RANK_UNIT).cast("long").alias("rank_micro"))
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges["src_host"] == ranks["host"])
            .join(outw, "src_host")
            .select(
                F.col("dst_host").alias("host"),
                (F.col("n_links") * F.expr("rank_micro div outw")).alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            hosts.join(contrib, "host", "left")
            .select(
                "host",
                (
                    F.lit(base)
                    + F.expr(
                        f"(coalesce(inflow, 0) * {damping_pct}) div 100"
                    )
                ).cast("long").alias("rank_micro"),
            )
        )
    return ranks
