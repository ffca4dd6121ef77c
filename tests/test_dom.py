"""DOM-tree readability extraction: scoring, tolerance, Spark parity."""

from __future__ import annotations

from chug_spark.ops.dom import dom_extract, extract_one

ARTICLE_PAGE = (
    "<html><head><title>An Article</title>"
    "<script>var x='<div>junk</div>';</script></head>"
    "<body>"
    "<nav id='topnav'><ul><li><a href='/'>home</a></li>"
    "<li><a href='/b'>blog</a></li></ul></nav>"
    "<div id='page'>"
    "<div id='sidebar'><ul><li><a href='1'>related post one</a></li>"
    "<li><a href='2'>related post two with text</a></li></ul></div>"
    "<article id='main'><h1>A Decent Headline For The Piece</h1>"
    "<p>The first paragraph of the body, with a comma, and enough length "
    "to score some readability points for its parent container.</p>"
    "<p>A second paragraph, also commaful, also long enough to contribute "
    "to the article node and push it past the sidebar.</p>"
    "<blockquote>A quoted line that is long enough to count as a block "
    "too.</blockquote>"
    "</article>"
    "<div id='comments'><p><a href='u1'>user1</a> says: nah</p>"
    "<p><a href='u2'>user2</a> ok</p></div>"
    "</div></body></html>"
)


def test_dom_scoring_picks_article():
    title, path, score, n_blocks, text = extract_one(ARTICLE_PAGE)
    assert title == "An Article"
    assert path == "html/body/div#page/article#main"
    assert score > 0 and n_blocks == 4
    blocks = text.split("\n")
    assert blocks[0] == "A Decent Headline For The Piece"
    assert "past the sidebar" in blocks[2]
    # chrome never leaks into the winning container
    assert "related post" not in text and "home" not in text
    assert "user1" not in text and "junk" not in text


def test_dom_link_density_damps_chrome():
    """A link-list container with MORE raw text than the article must still
    lose: its score is damped by link density."""
    page = (
        "<body><div id='links'>"
        + "".join(
            f"<li><a href='{i}'>a linked headline that is long enough to "
            f"score points number {i}, with commas, plenty</a></li>"
            for i in range(8)
        )
        + "</div><div id='art'><p>One honest paragraph, modest length, "
        "with a couple of commas, that should win anyway.</p></div></body>"
    )
    _, path, _, _, text = extract_one(page)
    assert path == "body/div#art"
    assert "honest paragraph" in text


def test_dom_tolerates_malformed_and_deep_input():
    # unclosed tags, stray end tags, attribute with '>', 2000-deep nesting:
    # must not throw, must not recurse
    assert extract_one("<p>unclosed tag with enough text, commas, to be kept")[4] != ""
    assert extract_one("</div></p>stray closers then real text, with commas")[4] != ""
    t = extract_one("<div>" * 2000 + "<p>deep page text, long enough to score, "
                    "with commas</p>" + "</div>" * 2000)
    assert "deep page text" in t[4]
    # script containing markup is CDATA — never parsed as structure
    assert extract_one("<script><div id='x'><p>ghost, ghost, ghost</p></div>"
                       "</script><p>real text that is long enough, yes</p>")[4].startswith("real text")


def test_dom_wide_sibling_page_is_linear():
    """5000 sibling paragraphs must parse+score in well under a second —
    guards against accidental O(n^2) list-shift walks."""
    import time

    page = ("<body><div id='page'><article id='m'>"
            + "".join(f"<p>paragraph number {i}, with commas, long enough "
                      f"to score</p>" for i in range(5000))
            + "</article></div></body>")
    t0 = time.monotonic()
    _, path, _, n_blocks, _ = extract_one(page)
    assert time.monotonic() - t0 < 2.0
    assert n_blocks == 5000 and path == "body/div#page/article#m"


def test_dom_fallback_for_plain_text():
    """No candidate container: classic readability fallback to body text."""
    title, path, score, n_blocks, text = extract_one(
        "plain text with no tags at all but quite long, with a comma"
    )
    assert path is None and score == 0.0 and n_blocks == 0
    assert text.startswith("plain text")
    assert extract_one("")[4] == "" and extract_one(None)[4] == ""


def test_dom_extract_spark_parity(spark):
    """The mapInPandas path must agree cell-for-cell with direct
    extract_one calls on the same strings (the pure-Python oracle)."""
    pages = [
        (1, ARTICLE_PAGE),
        (2, "plain text fallback page, long enough, with commas"),
        (3, ""),
        (4, None),
    ]
    docs = spark.createDataFrame(pages, "doc_id long, html string")
    got = {r["doc_id"]: r for r in dom_extract(docs).collect()}
    for doc_id, html in pages:
        title, path, score, n_blocks, text = extract_one(html)
        r = got[doc_id]
        assert (r["title"], r["best_path"], r["score"], r["n_blocks"],
                r["main_text"]) == (title, path, score, n_blocks, text)


def test_dom_extract_plan_shape(spark):
    """Pure map by default: ZERO exchanges, the parse pipelines behind the
    scan.  The explicit fan-out for degenerate inputs (single-row-group
    fixtures) is opt-in via repartition=N and adds exactly one exchange."""
    docs = spark.createDataFrame(
        [(i, f"<div><p>page {i} body text, with commas, long enough to "
             f"score</p></div>") for i in range(10)],
        "doc_id long, html string",
    )
    plan = dom_extract(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0
    assert plan.count("MapInPandas") == 1

    plan_r = dom_extract(docs, repartition=8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan_r.count("Exchange") == 1
    assert plan_r.count("MapInPandas") == 1


def test_dom_unclosed_drop_tag_does_not_eat_document():
    """An unclosed DROP_TAGS element (e.g. <form> never closed) must not
    swallow the rest of the document: a block-level ancestor's end tag
    implicitly terminates the dropped subtree (r4 ADVICE)."""
    page = (
        "<html><body><div id='page'>"
        "<div id='chrome'><form action='/s'><input name='q'>"
        # NOTE: </form> never arrives; </div> below closes the subtree
        "</div>"
        "<article id='main'>"
        "<p>The real article text, long enough to win readability scoring, "
        "with a comma, and some more words for good measure.</p>"
        "<p>A second paragraph that also counts, with its own comma, and "
        "plenty of characters to pass the block threshold.</p>"
        "</article>"
        "</div></body></html>"
    )
    title, path, score, n_blocks, text = extract_one(page)
    assert "real article text" in text
    assert n_blocks >= 2

    # fully-closed form still drops its own content
    closed = page.replace("<input name='q'>", "<input name='q'>drop me</form>")
    _, _, _, _, text2 = extract_one(closed)
    assert "drop me" not in text2
    assert "real article text" in text2


def test_dom_wellformed_drop_subtree_with_ancestor_tag_inside():
    """A WELL-FORMED dropped subtree containing an element whose tag also
    matches an open ancestor (div inside form inside div — ubiquitous in
    real pages) must not trigger the unclosed-drop recovery: the inner
    </div> closes the form's own div, the drop stays scoped to the form,
    and content after the chrome block is kept (regression: the r5
    recovery reset _drop on ANY ancestor-matching end tag, truncating
    well-formed pages)."""
    page = (
        "<div id='page'><article id='main'>"
        "<p>A first paragraph long enough to count as a real block, with "
        "a comma, and plenty of words.</p>"
        "<div id='chrome'><form><div><input></div>form text</form></div>"
        "<p>A second paragraph also easily long enough to be kept, with "
        "another comma in it.</p>"
        "</article></div>"
    )
    _, path, _, n_blocks, text = extract_one(page)
    assert "second paragraph" in text
    assert "form text" not in text
    assert n_blocks >= 2
    assert path.endswith("article#main")

    # same page but the form ALSO unclosed: recovery must still fire when
    # </div> arrives with no matching open inside the drop
    unclosed = page.replace("form text</form>", "form text")
    _, _, _, _, text3 = extract_one(unclosed)
    assert "second paragraph" in text3
    assert "form text" not in text3


def test_dom_nested_drop_tags_stale_open_entry():
    """DROP_TAGS nested inside DROP_TAGS (nav inside form) with an unclosed
    element inside the inner one: closing the inner drop tag must discard
    the opens recorded under it, or a stale entry later swallows the
    ancestor's end tag and the rest of the document (review finding, r5)."""
    page = (
        "<div id='page'><article id='main'><div id='wrap'>"
        "<p>A first paragraph long enough to count as a real block, with "
        "a comma, and plenty of words in it.</p>"
        "<form><nav><div>menu entry</nav>form text"  # div AND form unclosed
        "</div>"  # closes #wrap → must trigger unclosed-drop recovery
        "<p>A second paragraph also easily long enough to be kept, with "
        "another comma in it.</p>"
        "</div></article>"
    )
    _, _, _, _, text = extract_one(page)
    assert "second paragraph" in text
    assert "form text" not in text
    assert "menu entry" not in text

    # fully well-formed nested drop: everything inside <form> dies with it,
    # content after </form> is kept
    ok = (
        "<article id='main'>"
        "<p>A first paragraph long enough to count as a real block, with "
        "a comma, and plenty of words in it.</p>"
        "<form><nav><div>menu entry</div></nav>form tail</form>"
        "<p>A second paragraph also easily long enough to be kept, with "
        "another comma in it.</p></article>"
    )
    _, _, _, _, text2 = extract_one(ok)
    assert "second paragraph" in text2
    assert "form tail" not in text2
    assert "menu entry" not in text2
