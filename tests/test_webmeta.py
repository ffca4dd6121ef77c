"""Page-metadata ops (ops/webmeta.py): OpenGraph, soft-404, sitemap."""

from chug_spark.ops.webmeta import (
    extract_opengraph,
    parse_sitemap,
    soft404_detect,
)


def test_opengraph_and_canonical(spark):
    rows = [
        (1, '<META property="og:title" content="T1">'
            '<link rel="canonical" href="https://c/1">'),
        (2, '<meta property="og:image" content="https://i/2.png">'),
        (3, "<p>nothing</p>"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    out = {r.doc_id: r for r in extract_opengraph(df).collect()}
    assert out[1].og_title == "T1" and out[1].canonical_url == "https://c/1"
    assert out[2].og_image == "https://i/2.png" and out[2].og_title is None
    assert out[3].og_title is None and out[4].canonical_url is None


def test_soft404_two_signal_rule(spark):
    long_article = "<title>History</title>" + "<p>word</p>" * 40 + \
        "<p>servers often return a 404 error when pages move</p>"
    rows = [
        (1, "<title>404 Not Found</title><p>gone</p>"),          # title
        (2, "<title>Hm</title><p>The page you requested was not found.</p>"),
        (3, long_article),                                        # mention only
        (4, "<title>Fine</title><p>" + "word " * 50 + "</p>"),    # clean
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    out = {r.doc_id: r for r in soft404_detect(df).collect()}
    assert out[1].soft404 and out[1].title_404
    assert out[2].soft404 and out[2].body_404 and not out[2].title_404
    assert out[3].body_404 and not out[3].soft404  # long mention survives
    assert not out[4].soft404


def test_sitemap_urlset_index_and_nonsitemap(spark):
    urlset = ("<urlset><url><loc> https://a/1 </loc>"
              "<lastmod>2020-01-02</lastmod><priority>0.5</priority></url>"
              "<url><loc>https://a/2</loc></url></urlset>")
    index = ("<sitemapindex><sitemap><loc>https://a/s.xml</loc>"
             "</sitemap></sitemapindex>")
    df = spark.createDataFrame(
        [(1, urlset), (2, index), (3, "<html>no</html>"), (4, None)],
        "doc_id long, xml string",
    )
    rows = sorted(
        ((r.doc_id, r.entry_no, r.kind, r.loc, r.lastmod, r.priority)
         for r in parse_sitemap(df).collect())
    )
    assert rows == [
        (1, 0, "url", "https://a/1", "2020-01-02", "0.5"),  # loc ws-trimmed
        (1, 1, "url", "https://a/2", None, None),
        (2, 0, "sitemap", "https://a/s.xml", None, None),
        (3, None, None, None, None, None),  # outer explode keeps the doc
        (4, None, None, None, None, None),
    ]


def test_feed_rss_atom_and_nonfeed(spark):
    from chug_spark.ops.webmeta import parse_feed

    rss = ("<rss><channel><item><title>A</title><link>https://x/a</link>"
           "<pubDate>d1</pubDate></item></channel></rss>")
    atom = ('<feed><entry><title>B</title>'
            '<link rel="alternate" href="https://x/b"/>'
            "<updated>d2</updated></entry></feed>")
    df = spark.createDataFrame(
        [(1, rss), (2, atom), (3, "<html>n</html>")],
        "doc_id long, xml string",
    )
    rows = sorted(
        (r.doc_id, r.entry_no, r.kind, r.title, r.link, r.published)
        for r in parse_feed(df).collect()
    )
    assert rows == [
        (1, 0, "rss", "A", "https://x/a", "d1"),
        (2, 0, "atom", "B", "https://x/b", "d2"),
        (3, None, None, None, None, None),
    ]
