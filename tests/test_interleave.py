"""Caption mining from interleaved span streams (ops/interleave.py)."""

import pytest

from chug_spark.ops.interleave import mine_captions


@pytest.fixture(scope="module")
def spans(spark):
    # doc a: text / media / text          -> after wins
    # doc b: media first, text after only -> after
    # doc c: text then media at end       -> before
    # doc d: media only                   -> none
    # doc e: empty/whitespace text neighbors are skipped over
    rows = [
        ("a", 0, "text", " lead in ", None),
        ("a", 1, "media", None, "m:a:0"),
        ("a", 2, "text", "figure one caption", None),
        ("b", 0, "media", None, "m:b:0"),
        ("b", 1, "text", "caption below", None),
        ("c", 0, "text", "above the fold", None),
        ("c", 1, "media", None, "m:c:0"),
        ("d", 0, "media", None, "m:d:0"),
        ("e", 0, "text", "   ", None),
        ("e", 1, "media", None, "m:e:0"),
        ("e", 2, "text", "", None),
        ("e", 3, "text", "real text", None),
    ]
    return spark.createDataFrame(
        rows, "doc_id string, offset int, kind string, text string, media_ref string"
    )


def test_neighbor_selection_and_fallback(spans):
    out = {r.media_ref: r for r in mine_captions(spans).collect()}
    assert out["m:a:0"].caption == "figure one caption"
    assert out["m:a:0"].cap_src == "after"
    assert out["m:a:0"].before_text == "lead in"  # trimmed
    assert out["m:b:0"].caption == "caption below"
    assert out["m:c:0"].caption == "above the fold"
    assert out["m:c:0"].cap_src == "before"
    assert out["m:d:0"].caption is None
    assert out["m:d:0"].cap_src == "none"
    # whitespace-only and empty text spans are not neighbors
    assert out["m:e:0"].caption == "real text"
    assert out["m:e:0"].before_text is None


def test_truncation_and_plan(spans, spark):
    long = spark.createDataFrame(
        [("x", 0, "media", None, "m"), ("x", 1, "text", "w" * 500, None)],
        "doc_id string, offset int, kind string, text string, media_ref string",
    )
    row = mine_captions(long, max_chars=7).collect()[0]
    assert row.caption == "wwwwwww"
    # one shuffle, both neighbor windows share the sort (no second exchange)
    plan = mine_captions(long)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1
