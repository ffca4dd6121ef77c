"""XY-cut layout analysis: kernel semantics + the Spark surface."""

import numpy as np
import pytest

from chug_spark.ops.layout import layout_blocks, reading_order, xy_cut


def _boxes(rows):
    """rows: list of (x, y, w, h) -> four arrays."""
    a = np.array(rows, dtype=np.int64)
    return a[:, 0], a[:, 1], a[:, 2], a[:, 3]


def _flat(leaves):
    return [int(i) for leaf in leaves for i in leaf]


def test_empty_and_single():
    e = np.array([], dtype=np.int64)
    assert xy_cut(e, e, e, e) == []
    leaves = xy_cut(*_boxes([(5, 5, 10, 10)]))
    assert _flat(leaves) == [0] and len(leaves) == 1


def test_two_columns_title():
    # full-width title over two columns; input order scrambled
    rows = [
        (50, 0, 180, 16),  # 0 title
        (250, 0, 180, 16),  # 1 title
        (50, 40, 80, 12),  # 2 left col line 0
        (140, 40, 80, 12),  # 3 left col line 0
        (50, 60, 80, 12),  # 4 left col line 1
        (450, 40, 80, 12),  # 5 right col line 0
        (450, 60, 80, 12),  # 6 right col line 1
    ]
    perm = [5, 2, 0, 6, 4, 1, 3]
    x, y, w, h = _boxes([rows[i] for i in perm])
    leaves = xy_cut(x, y, w, h)
    # reading order recovers original order: title, left top-down, right
    assert [perm[i] for i in _flat(leaves)] == [0, 1, 2, 3, 4, 5, 6]
    assert [len(l) for l in leaves] == [2, 3, 2]


def test_three_columns():
    rows = []
    for c, cx in enumerate((0, 200, 400)):
        for line in range(3):
            rows.append((cx, 30 * line, 100, 10))
    leaves = xy_cut(*_boxes(rows), h_gap=25, v_gap=50)
    assert [len(l) for l in leaves] == [3, 3, 3]
    assert _flat(leaves) == list(range(9))


def test_nested_sections():
    # two stacked 2-column sections with a full-width separator between:
    # order = sec1 left, sec1 right, separator, sec2 left, sec2 right
    sec1 = [(0, 0, 100, 10), (300, 0, 100, 10)]
    sep = [(0, 50, 400, 10)]
    sec2 = [(0, 100, 100, 10), (300, 100, 100, 10)]
    leaves = xy_cut(*_boxes(sec1 + sep + sec2))
    assert [list(map(int, l)) for l in leaves] == [[0], [1], [2], [3], [4]]


def test_no_gap_falls_back_to_line_sort():
    # overlapping/connected boxes: one leaf, (y, x)-sorted
    rows = [(10, 10, 50, 50), (40, 5, 50, 50), (5, 30, 50, 50)]
    leaves = xy_cut(*_boxes(rows))
    assert len(leaves) == 1
    assert _flat(leaves) == [1, 0, 2]  # y=5 first, then y=10, then y=30


def test_permutation_property():
    rng = np.random.RandomState(7)
    for _ in range(25):
        n = int(rng.randint(1, 60))
        x = rng.randint(0, 500, n)
        y = rng.randint(0, 500, n)
        w = rng.randint(1, 120, n)
        h = rng.randint(1, 40, n)
        leaves = xy_cut(x, y, w, h)
        assert sorted(_flat(leaves)) == list(range(n))


def test_l_shaped_figure_caption():
    # figure occupying the top-right quadrant with body text flowing in an
    # L: left column full height, bottom band full width under the figure
    left = [(0, 30 * i, 100, 10) for i in range(6)]  # y 0..150
    fig = [(200, 0, 200, 60)]  # top-right figure block
    band = [(200, 120, 90, 10), (300, 120, 90, 10)]  # caption under figure
    leaves = xy_cut(*_boxes(left + fig + band))
    order = _flat(leaves)
    # left column reads before the figure, figure before its caption
    assert order.index(6) > order.index(0)
    assert order.index(7) > order.index(6)
    assert sorted(order) == list(range(9))


def test_reading_order_spark(spark):
    rows = [
        (
            1,
            [
                {"x": 450, "y": 40, "w": 80, "h": 12, "text": "right"},
                {"x": 50, "y": 0, "w": 180, "h": 16, "text": "Title"},
                {"x": 50, "y": 40, "w": 80, "h": 12, "text": "left"},
            ],
        ),
        (2, []),
        (3, None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, boxes array<struct<x:int,y:int,w:int,h:int,text:string>>"
    )
    out = reading_order(df).orderBy("doc_id", "k").collect()
    assert [(r.doc_id, r.k, r.block, r.text) for r in out] == [
        (1, 0, 0, "Title"),
        (1, 1, 1, "left"),
        (1, 2, 2, "right"),
    ]
    blocks = layout_blocks(df).orderBy("doc_id", "block").collect()
    assert [(b.block, b.n_words, b.block_text, b.x0, b.y0) for b in blocks] == [
        (0, 1, "Title", 50, 0),
        (1, 1, "left", 50, 40),
        (2, 1, "right", 450, 40),
    ]


def test_reading_order_pages_spark(spark):
    from chug_spark.ops.layout import reading_order_pages

    box = lambda x, y, w, h, t: {"x": x, "y": y, "w": w, "h": h, "text": t}
    rows = [
        # doc 1, page 1: two columns, shuffled; page 0: a single title line
        (1, 1, [box(450, 0, 80, 12, "p1right"), box(0, 0, 80, 12, "p1left")]),
        (1, 0, [box(50, 0, 180, 16, "title")]),
        # doc 2: empty page then one word — empty pages contribute no rows
        # and no offset
        (2, 0, []),
        (2, 1, [box(0, 0, 10, 10, "only")]),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, page int, "
        "boxes array<struct<x:int,y:int,w:int,h:int,text:string>>",
    )
    out = reading_order_pages(df).orderBy("doc_id", "k").collect()
    assert [(r.doc_id, r.page, r.k, r.text) for r in out] == [
        (1, 0, 0, "title"),
        (1, 1, 1, "p1left"),
        (1, 1, 2, "p1right"),
        (2, 1, 0, "only"),
    ]


def test_gap_clusters():
    from chug_spark.ops.layout import _gap_clusters

    s = np.array([40, 160, 40, 60, 280, 41])
    ids = _gap_clusters(s, 30)
    # 40/40/41/60 cluster together (consecutive sorted gaps < 30), then
    # 160, then 280
    assert list(ids) == [0, 1, 0, 0, 2, 0]


def test_table_cells_spark(spark):
    from chug_spark.ops.layout import table_cells

    box = lambda x, y, t: {"x": x, "y": y, "w": 15, "h": 10, "text": t}
    # 2x2 grid with a two-word cell at (0,0), input shuffled
    rows = [
        (
            7,
            [
                box(160, 20, "d"),
                box(40, 0, "a1"),
                box(160, 0, "b"),
                box(60, 0, "a2"),
                box(40, 20, "c"),
            ],
        ),
        (8, []),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, boxes array<struct<x:int,y:int,w:int,h:int,text:string>>"
    )
    out = table_cells(df).orderBy("row", "col").collect()
    assert [(r.row, r.col, r.cell_text, r.x0, r.y0) for r in out] == [
        (0, 0, "a1 a2", 40, 0),
        (0, 1, "b", 160, 0),
        (1, 0, "c", 40, 20),
        (1, 1, "d", 160, 20),
    ]


def test_flag_running_headers(spark):
    from chug_spark.ops.layout import flag_running_headers

    rows = []
    # doc 1: 4 pages, repeated header + digit-varying footer + unique body
    for p in range(4):
        rows += [
            (1, p, 0, "Annual Report"),
            (1, p, 1, "unique body text " + "very " * (p + 1) + "substantial"),
            (1, p, 2, f"Page {p + 1}"),
        ]
    # doc 2: only 2 pages (< min_pages) — nothing flagged
    for p in range(2):
        rows += [(2, p, 0, "Annual Report"), (2, p, 1, f"body {p} stuff")]
    df = spark.createDataFrame(
        rows, "doc_id long, page int, block int, block_text string"
    )
    out = {
        (r.doc_id, r.page, r.block): r.is_template
        for r in flag_running_headers(df).collect()
    }
    for p in range(4):
        assert out[(1, p, 0)] is True  # header
        assert out[(1, p, 2)] is True  # page number (digit-folded)
    # bodies survive: they differ in words, not digits (a body that
    # differs ONLY in a digit folds to one key and is — correctly —
    # treated as chrome)
    assert all(out[(1, p, 1)] is False for p in range(4))
    assert all(not out[(2, p, b)] for p in range(2) for b in (0, 1))


def test_layout_spans_schema(spark):
    from chug_spark.ops.layout import layout_spans

    rows = [
        (
            1,
            [
                {"x": 50, "y": 40, "w": 80, "h": 12, "text": "body"},
                {"x": 50, "y": 0, "w": 180, "h": 16, "text": "Title"},
            ],
        )
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, boxes array<struct<x:int,y:int,w:int,h:int,text:string>>"
    )
    out = layout_spans(df).orderBy("offset").collect()
    assert [f.name for f in layout_spans(df).schema.fields] == [
        "doc_id", "offset", "kind", "text", "media_ref",
    ]
    assert [(r.offset, r.kind, r.text, r.media_ref) for r in out] == [
        (0, "text", "Title", None),
        (1, "text", "body", None),
    ]


def test_xy_cut_scales_to_giant_pages():
    # worst-case shredding: a 200-column x 500-row lattice where nearly
    # every region splits down to unit blocks — guards the vectorized
    # gap sweep against a per-element-Python-loop regression
    import time

    rng = np.random.RandomState(3)
    n = 20_000
    x = (rng.randint(0, 200, n) * 100).astype(np.int64)
    y = (rng.randint(0, 500, n) * 40).astype(np.int64)
    w = np.full(n, 40)
    h = np.full(n, 12)
    t0 = time.time()
    leaves = xy_cut(x, y, w, h)
    assert time.time() - t0 < 5.0
    assert sorted(_flat(leaves)) == list(range(n))


def test_figure_captions(spark):
    from chug_spark.ops.layout import figure_captions

    box = lambda x, y, w, h, t: {"x": x, "y": y, "w": w, "h": h, "text": t}
    rows = [
        (
            1,
            [
                box(200, 0, 200, 60, None),        # figure
                box(210, 70, 90, 10, "Figure"),    # caption word 1
                box(310, 70, 60, 10, "one"),       # caption word 2
                box(210, 90, 90, 10, "body"),      # second line: NOT caption
                box(0, 70, 90, 10, "left"),        # no x-overlap
                box(210, 200, 90, 10, "far"),      # below max_dy
                box(500, 0, 80, 60, None),         # captionless figure
            ],
        ),
        (2, [box(0, 0, 50, 50, None)]),            # lone figure, no words
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, boxes array<struct<x:int,y:int,w:int,h:int,text:string>>"
    )
    out = [
        (r.doc_id, r.fig_i, r.caption)
        for r in figure_captions(df).orderBy("doc_id", "fig_i").collect()
    ]
    assert out == [(1, 0, "Figure one"), (1, 6, None), (2, 0, None)]


def test_heading_outline(spark):
    from chug_spark.ops.layout import heading_outline

    box = lambda x, y, h, t: {"x": x, "y": y, "w": 80, "h": h, "text": t}
    rows = [
        (
            1,
            [
                box(0, 160, 24, "Conclusion"),       # h1 (shuffled input)
                box(0, 0, 24, "Intro"), box(100, 0, 24, "duction"),
                box(0, 40, 16, "Background"),
                box(0, 80, 12, "body-ignored"),
                box(0, 120, 16, "Methods"),
            ],
        ),
        (2, [box(0, 0, 16, "orphan"), box(0, 30, 16, "second")]),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, boxes array<struct<x:int,y:int,w:int,h:int,text:string>>"
    )
    out = [
        (r.doc_id, r.pos, r.level, r.section, r.heading)
        for r in heading_outline(df).orderBy("doc_id", "pos").collect()
    ]
    assert out == [
        (1, 0, 1, "1", "Intro duction"),
        (1, 1, 2, "1.1", "Background"),
        (1, 2, 2, "1.2", "Methods"),
        (1, 3, 1, "2", "Conclusion"),
        (2, 0, 2, "0.1", "orphan"),
        (2, 1, 2, "0.2", "second"),
    ]
