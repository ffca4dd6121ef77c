"""HTML main-content extraction: boilerplate strip + block heuristics."""

from __future__ import annotations

from chug_spark.ops.html import html_main_content


def test_html_main_content_extraction(spark):
    page = (
        "<html><head><title> The  Title </title>"
        "<style>p { color: red }</style></head>"
        "<body>"
        "<nav><a href='/'>home</a> <a href='/a'>about</a></nav>"
        "<header>SiteName — tagline here</header>"
        "<h1>A Heading Long Enough To Keep</h1>"
        "<p>This is the first real paragraph of the article body.</p>"
        "<div>Second block with an inline <a href='x'>link</a> inside "
        "a long sentence that should survive.</p>"
        "<p>tiny</p>"  # below min_block_chars -> dropped
        "<p><a href='/sub'>click here to subscribe now and save money</a></p>"
        "<p>Entities: &amp;lt; stays, &lt;b&gt; becomes angle brackets, "
        "&quot;quoted&quot; &#39;x&#39; &nbsp;ok</p>"
        "<script>var x = '<p>not content</p>';</script>"
        "<footer>copyright 2024 somebody</footer>"
        "</body></html>"
    )
    docs = spark.createDataFrame([(1, page)], ["doc_id", "html"])
    row = html_main_content(docs).collect()[0]
    assert row["title"] == "The Title"
    blocks = row["main_text"].split("\n")
    assert blocks[0] == "A Heading Long Enough To Keep"
    assert blocks[1] == "This is the first real paragraph of the article body."
    assert blocks[2] == (
        "Second block with an inline link inside a long sentence that should survive."
    )
    assert blocks[3] == (
        "Entities: &lt; stays, <b> becomes angle brackets, \"quoted\" 'x' ok"
    )
    assert len(blocks) == 4
    # dropped: tiny (too short), subscribe (link density 1.0);
    # nav/header/footer/script/style never reach scoring
    assert row["n_kept"] == 4
    assert row["n_dropped"] == 2
    text = row["main_text"]
    assert "home" not in text and "SiteName" not in text
    assert "subscribe" not in text and "copyright" not in text
    assert "color: red" not in text and "not content" not in text


def test_html_main_content_is_map_only(spark):
    docs = spark.createDataFrame(
        [(i, f"<p>block {i} with enough characters to keep</p>") for i in range(20)],
        ["doc_id", "html"],
    )
    plan = (
        html_main_content(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure map: no shuffle at any scale
