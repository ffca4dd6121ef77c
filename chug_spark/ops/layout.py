"""PDF layout analysis: reading-order reconstruction via recursive XY-cut.

The north rule's extraction triad is "HTML boilerplate strip, PDF/layout
parse, DOM heuristics".  The PDF *decode* side (page render + text-layer
span emission, ref ``/root/reference/src/chug/doc/doc_processor.py:239-320``)
lives in :mod:`chug_spark.extract` / :mod:`chug_spark.media`; this module is
the *layout* side proper: given the positioned word boxes a real text layer
yields (pypdfium2's ``page.get_textpage()`` charboxes, or any OCR engine's
word geometry), reconstruct the human reading order — multi-column pages,
full-width headings, stacked sections — and group words into layout blocks.

Algorithm: the classic recursive XY-cut (Nagy & Seth 1984, the standard
top-down page segmentation used by every document-AI preprocessing stack).
At each region, project the boxes onto both axes, find the largest empty
gap in each projection (merged-interval sweep), and split on the larger
gap that clears its axis threshold — horizontal cuts (top/bottom, gap in
the y-projection) win ties, matching column-before-row reading.  Regions
with no qualifying gap are leaves; a leaf's words sort by (y, x), i.e.
line-major.  Leaves emit in cut order (top/left subtree first), which IS
the reading order; each leaf is one layout block.

Spark-side this is ONE Arrow-batched ``mapInPandas`` pass over
``(doc_id, boxes)`` rows — a pure map, no shuffle, pipelines behind the
scan.  A page's cost is O(b log b) in its box count with at most 2b-1
regions total (each split strictly shrinks both sides), so a giant page
costs like its text layer and upstream page-size capping is the skew
control, exactly as for the render/DOM legs.  All region processing is an
explicit stack — adversarial layouts cannot hit the recursion limit.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: minimum empty gap (in page units) for a horizontal cut (y-projection):
#: separates title/heading bands, stacked sections, paragraphs-with-leading
H_GAP = 20
#: minimum empty gap for a vertical cut (x-projection): separates columns;
#: larger than H_GAP so inter-word spacing never reads as a column break
V_GAP = 30


def _largest_gap(starts: np.ndarray, ends: np.ndarray) -> tuple[int, int]:
    """Largest empty gap in the union of [start, end) intervals.

    Returns ``(gap, cut)`` where ``cut`` is a coordinate strictly inside
    the gap (its midpoint); ``gap == 0`` means the projection is connected.
    Merged-interval sweep, fully vectorized (sort + running-max cover +
    diff) so a giant region costs numpy time, not a Python loop — the
    first maximal gap wins, same tie rule as the scalar sweep.
    """
    order = np.argsort(starts, kind="mergesort")
    s = starts[order]
    cover = np.maximum.accumulate(ends[order])
    if len(s) < 2:
        return 0, 0
    gaps = s[1:] - cover[:-1]
    i = int(np.argmax(gaps))
    g = int(gaps[i])
    if g <= 0:
        return 0, 0
    return g, int(cover[i]) + g // 2


def xy_cut(
    x: np.ndarray,
    y: np.ndarray,
    w: np.ndarray,
    h: np.ndarray,
    h_gap: int = H_GAP,
    v_gap: int = V_GAP,
) -> list[np.ndarray]:
    """Segment word boxes into layout blocks in reading order.

    Returns a list of index arrays (into the input), one per leaf block,
    blocks in reading order and each block's indices line-major (y, then
    x).  The concatenation is a permutation of ``range(len(x))``.
    """
    n = len(x)
    if n == 0:
        return []
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    x2 = x + np.asarray(w, dtype=np.int64)
    y2 = y + np.asarray(h, dtype=np.int64)

    leaves: list[np.ndarray] = []
    # LIFO with the top/left part pushed last => popped (and emitted) first
    stack: list[np.ndarray] = [np.arange(n)]
    # each split yields two non-empty strict subsets => <= 2n-1 regions ever;
    # the guard is a defensive backstop, not a reachable path
    guard = 2 * n + 8
    while stack:
        idx = stack.pop()
        split = None
        if len(idx) > 1 and guard > 0:
            guard -= 1
            gh, cy = _largest_gap(y[idx], y2[idx])
            gv, cx = _largest_gap(x[idx], x2[idx])
            if gh >= h_gap and (gh >= gv or gv < v_gap):
                first = idx[y2[idx] <= cy]  # gap is empty: every box is
                second = idx[y2[idx] > cy]  # entirely on one side of cut
                split = (first, second)
            elif gv >= v_gap:
                first = idx[x2[idx] <= cx]
                second = idx[x2[idx] > cx]
                split = (first, second)
        if split is not None:
            stack.append(split[1])
            stack.append(split[0])
        else:
            order = np.lexsort((x[idx], y[idx]))  # line-major: y, then x
            leaves.append(idx[order])
    return leaves


#: struct fields expected in the ``boxes`` array column
BOX_SCHEMA = "array<struct<x:int,y:int,w:int,h:int,text:string>>"

_ORDER_SCHEMA = "doc_id long, k int, block int, x int, y int, text string"


def reading_order(
    docs: DataFrame,
    boxes_col: str = "boxes",
    h_gap: int = H_GAP,
    v_gap: int = V_GAP,
    repartition: int | None = None,
) -> DataFrame:
    """(doc_id, k, block, x, y, text) per word box, k = reading-order rank.

    ``boxes_col`` is an ``array<struct<x,y,w,h,text>>`` page text layer in
    ARBITRARY array order (text layers come in extraction order, not
    reading order — that is the whole problem).  Pure map; pass
    ``repartition=N`` only for degenerate single-split inputs, same knob
    and rationale as :func:`chug_spark.ops.dom.dom_extract`.
    """
    import pandas as pd

    src = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(boxes_col).alias("boxes"),
    )
    if repartition:
        src = src.repartition(repartition, "doc_id")

    def run(batches):
        for pdf in batches:
            dids: list[int] = []
            ks: list[int] = []
            blocks: list[int] = []
            xs: list[int] = []
            ys: list[int] = []
            texts: list[str] = []
            for did, boxes in zip(pdf["doc_id"], pdf["boxes"]):
                if boxes is None or len(boxes) == 0:
                    continue
                # a box with NULL geometry would raise inside np.fromiter
                # and kill the whole task — skip it, like null text (ADVICE r5)
                boxes = [b for b in boxes
                         if b["x"] is not None and b["y"] is not None
                         and b["w"] is not None and b["h"] is not None]
                if not boxes:
                    continue
                bx = np.fromiter((b["x"] for b in boxes), np.int64, len(boxes))
                by = np.fromiter((b["y"] for b in boxes), np.int64, len(boxes))
                bw = np.fromiter((b["w"] for b in boxes), np.int64, len(boxes))
                bh = np.fromiter((b["h"] for b in boxes), np.int64, len(boxes))
                btext = [b["text"] for b in boxes]
                k = 0
                for bi, leaf in enumerate(xy_cut(bx, by, bw, bh, h_gap, v_gap)):
                    for j in leaf:
                        dids.append(did)
                        ks.append(k)
                        blocks.append(bi)
                        xs.append(int(bx[j]))
                        ys.append(int(by[j]))
                        texts.append(btext[j])
                        k += 1
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(dids, dtype="int64"),
                    "k": pd.Series(ks, dtype="int32"),
                    "block": pd.Series(blocks, dtype="int32"),
                    "x": pd.Series(xs, dtype="int32"),
                    "y": pd.Series(ys, dtype="int32"),
                    "text": pd.Series(texts, dtype="object"),
                }
            )

    return src.mapInPandas(run, _ORDER_SCHEMA)


_PAGE_ORDER_SCHEMA = (
    "doc_id long, page int, k_page int, block int, x int, y int, text string"
)


def reading_order_pages(
    docs: DataFrame,
    boxes_col: str = "boxes",
    page_col: str = "page",
    h_gap: int = H_GAP,
    v_gap: int = V_GAP,
) -> DataFrame:
    """Multi-page reading order: (doc_id, page, k, block, x, y, text).

    Real text layers arrive one page at a time (pypdfium2 charboxes,
    OCR word geometry per rendered page), so the realistic input is one
    row per (doc, page).  Each page is XY-cut independently in the same
    single map pass as :func:`reading_order` — pages of a document need
    NOT be co-partitioned — and ``k`` is then promoted to a document-wide
    rank with ONE per-doc window — ``row_number() over (partition by
    doc_id order by page, k_page) - 1`` — a single keyed shuffle over the
    map output.  (A count-agg + running-sum + join-back derives the same
    offsets but duplicates the mapInPandas subtree in the physical plan —
    Spark re-evaluates the XY-cut once per consumer — so the window form
    is strictly better.)  ``block`` stays page-local (page breaks are
    real layout boundaries).
    """
    import pandas as pd
    from pyspark.sql import Window

    src = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(page_col).cast("int").alias("page"),
        F.col(boxes_col).alias("boxes"),
    )

    def run(batches):
        for pdf in batches:
            out = {
                "doc_id": [], "page": [], "k_page": [], "block": [],
                "x": [], "y": [], "text": [],
            }
            for did, pg, boxes in zip(pdf["doc_id"], pdf["page"], pdf["boxes"]):
                if boxes is None or len(boxes) == 0:
                    continue
                # a box with NULL geometry would raise inside np.fromiter
                # and kill the whole task — skip it, like null text (ADVICE r5)
                boxes = [b for b in boxes
                         if b["x"] is not None and b["y"] is not None
                         and b["w"] is not None and b["h"] is not None]
                if not boxes:
                    continue
                bx = np.fromiter((b["x"] for b in boxes), np.int64, len(boxes))
                by = np.fromiter((b["y"] for b in boxes), np.int64, len(boxes))
                bw = np.fromiter((b["w"] for b in boxes), np.int64, len(boxes))
                bh = np.fromiter((b["h"] for b in boxes), np.int64, len(boxes))
                btext = [b["text"] for b in boxes]
                k = 0
                for bi, leaf in enumerate(xy_cut(bx, by, bw, bh, h_gap, v_gap)):
                    for j in leaf:
                        out["doc_id"].append(did)
                        out["page"].append(pg)
                        out["k_page"].append(k)
                        out["block"].append(bi)
                        out["x"].append(int(bx[j]))
                        out["y"].append(int(by[j]))
                        out["text"].append(btext[j])
                        k += 1
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "page": pd.Series(out["page"], dtype="int32"),
                    "k_page": pd.Series(out["k_page"], dtype="int32"),
                    "block": pd.Series(out["block"], dtype="int32"),
                    "x": pd.Series(out["x"], dtype="int32"),
                    "y": pd.Series(out["y"], dtype="int32"),
                    "text": pd.Series(out["text"], dtype="object"),
                }
            )

    spans = src.mapInPandas(run, _PAGE_ORDER_SCHEMA)
    w = Window.partitionBy("doc_id").orderBy("page", "k_page")
    return spans.select(
        "doc_id", "page",
        (F.row_number().over(w) - 1).cast("int").alias("k"),
        "block", "x", "y", "text",
    )


def layout_blocks(
    docs: DataFrame,
    boxes_col: str = "boxes",
    h_gap: int = H_GAP,
    v_gap: int = V_GAP,
    repartition: int | None = None,
) -> DataFrame:
    """One row per layout block: (doc_id, block, n_words, block_text, bbox).

    :func:`reading_order` + one keyed agg; ``block_text`` joins the words
    in reading order (sort_array over (k, text) pairs — the per-block word
    count is page-bounded, so the in-row sort is O(block) not O(corpus)).
    """
    spans = reading_order(docs, boxes_col, h_gap, v_gap, repartition)
    return (
        spans.groupBy("doc_id", "block")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_words"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("k", "text"))),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("block_text"),
            F.min("x").alias("x0"),
            F.min("y").alias("y0"),
        )
        .select("doc_id", "block", "n_words", "block_text", "x0", "y0")
    )


def _gap_clusters(starts: np.ndarray, min_gap: int) -> np.ndarray:
    """1-D gap clustering: cluster id per element, ids ordered by
    coordinate.  Elements whose sorted starts are less than ``min_gap``
    apart share a cluster — the classic tab-stop detector."""
    order = np.argsort(starts, kind="mergesort")
    s = starts[order]
    ids = np.empty(len(s), dtype=np.int64)
    cid = 0
    ids[order[0]] = 0
    for i in range(1, len(s)):
        if s[i] - s[i - 1] >= min_gap:
            cid += 1
        ids[order[i]] = cid
    return ids


_TABLE_SCHEMA = (
    "doc_id long, row int, col int, cell_text string, x0 int, y0 int"
)


def table_cells(
    docs: DataFrame,
    boxes_col: str = "boxes",
    col_gap: int = 30,
    row_gap: int = 8,
    repartition: int | None = None,
) -> DataFrame:
    """Reconstruct tabular structure from positioned word boxes:
    (doc_id, row, col, cell_text, x0, y0) — the PDF-side complement of
    the HTML ``extract_tables`` op (pdfplumber-style lattice-free table
    recovery).  Columns are x-start tab stops (1-D gap clustering with
    ``col_gap``), rows are y-start bands (``row_gap``); a cell joins its
    words in x order.  Same execution shape as :func:`reading_order`:
    ONE Arrow-batched map pass, no shuffle, O(b log b) per page."""
    import pandas as pd

    src = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(boxes_col).alias("boxes"),
    )
    if repartition:
        src = src.repartition(repartition, "doc_id")

    def run(batches):
        for pdf in batches:
            out = {"doc_id": [], "row": [], "col": [], "cell_text": [],
                   "x0": [], "y0": []}
            for did, boxes in zip(pdf["doc_id"], pdf["boxes"]):
                if boxes is None or len(boxes) == 0:
                    continue
                # NULL-geometry guard, same rationale as reading_order
                boxes = [b for b in boxes
                         if b["x"] is not None and b["y"] is not None]
                if not boxes:
                    continue
                n = len(boxes)
                bx = np.fromiter((b["x"] for b in boxes), np.int64, n)
                by = np.fromiter((b["y"] for b in boxes), np.int64, n)
                btext = [b["text"] for b in boxes]
                rows = _gap_clusters(by, row_gap)
                cols = _gap_clusters(bx, col_gap)
                # cell = (row, col); words inside sort by x then y
                cells: dict = {}
                for j in range(n):
                    cells.setdefault((int(rows[j]), int(cols[j])), []).append(j)
                for (r, c), idx in sorted(cells.items()):
                    idx.sort(key=lambda j: (bx[j], by[j]))
                    out["doc_id"].append(did)
                    out["row"].append(r)
                    out["col"].append(c)
                    out["cell_text"].append(" ".join(btext[j] for j in idx))
                    out["x0"].append(int(min(bx[j] for j in idx)))
                    out["y0"].append(int(min(by[j] for j in idx)))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "row": pd.Series(out["row"], dtype="int32"),
                    "col": pd.Series(out["col"], dtype="int32"),
                    "cell_text": pd.Series(out["cell_text"], dtype="object"),
                    "x0": pd.Series(out["x0"], dtype="int32"),
                    "y0": pd.Series(out["y0"], dtype="int32"),
                }
            )

    return src.mapInPandas(run, _TABLE_SCHEMA)


def flag_running_headers(
    blocks: DataFrame,
    text_col: str = "block_text",
    min_pages: int = 3,
    ratio_bp: int = 6000,
) -> DataFrame:
    """Flag running headers/footers/page chrome in per-page layout blocks.

    Input rows are (doc_id, page, ..., ``text_col``); a block is template
    (``is_template`` = true) when its normalized text recurs on at least
    ``ratio_bp``/10000 of the document's pages and the document has at
    least ``min_pages`` pages.  Normalization lowercases, trims, and
    folds digit runs to '#' so "Page 3" / "Page 17" match — the classic
    running-page-number case.  The per-DOC relative threshold mirrors
    :func:`chug_spark.ops.textstats.host_template_strip`'s per-host rule
    one level down: a 400-page book's header (df=400) and a 4-page
    letter's header (df=4) are both template, while a sentence repeated
    on 2 pages of the book is not.

    Scale shape: page counts and per-(doc, line) dfs are two keyed aggs
    over #pages- and #distinct-line-bounded relations; the template set
    joins back on (doc_id, key) — everything keys on doc_id, no
    corpus-wide state, no pair expansion.
    """
    norm = F.regexp_replace(
        F.lower(F.trim(F.col(text_col))), "[0-9]+", "#"
    ).alias("tpl_key")
    base = blocks.select("*", norm)
    pages = base.groupBy("doc_id").agg(
        F.countDistinct("page").alias("n_pages")
    )
    dfs = (
        base.select("doc_id", "page", "tpl_key")
        .dropDuplicates(["doc_id", "page", "tpl_key"])
        .groupBy("doc_id", "tpl_key")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    tpl = (
        dfs.join(pages, "doc_id")
        .filter(
            (F.col("n_pages") >= min_pages)
            & (F.col("df") * 10000 >= ratio_bp * F.col("n_pages"))
        )
        .select("doc_id", "tpl_key", F.lit(True).alias("is_template"))
    )
    return (
        base.join(tpl, ["doc_id", "tpl_key"], "left")
        .withColumn("is_template", F.coalesce("is_template", F.lit(False)))
        .drop("tpl_key")
    )


def layout_spans(
    docs: DataFrame,
    boxes_col: str = "boxes",
    h_gap: int = H_GAP,
    v_gap: int = V_GAP,
) -> DataFrame:
    """Emit layout blocks in the engine's canonical span schema:
    (doc_id, offset, kind, text, media_ref) — the same per-row invariant
    the decode leg produces (ref interleaved span model,
    ``chug_spark.extract``), so a PDF text layer and a decoded payload
    are interchangeable downstream.  offset = reading-order block index,
    kind = 'text', media_ref NULL (a text layer carries no pixel refs);
    block text joins its words in reading order."""
    blocks = layout_blocks(docs, boxes_col, h_gap, v_gap)
    return blocks.select(
        "doc_id",
        F.col("block").cast("int").alias("offset"),
        F.lit("text").alias("kind"),
        F.col("block_text").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
    )


def figure_captions(
    docs: DataFrame,
    boxes_col: str = "boxes",
    max_dy: int = 60,
) -> DataFrame:
    """Pair page figures with their captions — the layout-side form of
    interleaved image-text pairing (the span-stream side is
    ``entry_ext.q_caption_mine``).

    A FIGURE is a box whose ``text`` is NULL (image regions in a real
    text layer have geometry but no characters).  Its caption is the
    nearest line of words that starts below the figure's bottom edge
    within ``max_dy`` page units and horizontally overlaps it; the
    line's words join in x order.  Figures with no such line emit with a
    NULL caption (left join — accounting preserved).

    Shape: one posexplode (map), one equi-join ON doc_id with the
    geometric predicates as join filters (per-doc work is bounded by the
    page's box count — upstream page capping is the skew control), one
    per-figure window min, one keyed agg.  Nothing corpus-wide.
    """
    b = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(F.col(boxes_col)).alias("i", "box"),
    ).select(
        "doc_id", "i",
        F.col("box.x").alias("x"), F.col("box.y").alias("y"),
        F.col("box.w").alias("w"), F.col("box.h").alias("h"),
        F.col("box.text").alias("text"),
    )
    figs = (
        b.filter(F.col("text").isNull())
        .select(
            "doc_id",
            F.col("i").alias("fig_i"),
            F.col("x").alias("fx"), F.col("y").alias("fy"),
            F.col("w").alias("fw"), F.col("h").alias("fh"),
        )
    )
    # rename the word side up front: both branches come from the same
    # exploded relation, and identically-named columns in a self-join are
    # ambiguous to the analyzer
    words = b.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").alias("wdoc"),
        F.col("x").alias("wx"), F.col("y").alias("wy"),
        F.col("w").alias("ww"), "text",
    )
    cand = figs.join(
        words,
        on=[
            figs["doc_id"] == words["wdoc"],
            words["wy"] >= figs["fy"] + figs["fh"],
            words["wy"] < figs["fy"] + figs["fh"] + F.lit(max_dy),
            words["wx"] < figs["fx"] + figs["fw"],
            words["wx"] + words["ww"] > figs["fx"],
        ],
        how="inner",
    ).select("doc_id", "fig_i", "fx", "fy", "wx", "wy", "text")
    from pyspark.sql import Window

    w_fig = Window.partitionBy("doc_id", "fig_i")
    nearest = cand.withColumn(
        "min_y", F.min("wy").over(w_fig)
    ).filter(F.col("wy") == F.col("min_y"))
    captions = nearest.groupBy("doc_id", "fig_i").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("wx", "text"))),
                lambda s: s["text"],
            ),
            " ",
        ).alias("caption")
    )
    return (
        figs.join(captions, ["doc_id", "fig_i"], "left")
        .select(
            "doc_id",
            F.col("fig_i").cast("int").alias("fig_i"),
            F.col("fx").cast("int").alias("fx"),
            F.col("fy").cast("int").alias("fy"),
            "caption",
        )
    )


def heading_outline(
    docs: DataFrame,
    boxes_col: str = "boxes",
    h1_min: int = 20,
    h2_min: int = 14,
) -> DataFrame:
    """Document outline (TOC) reconstruction from box heights: lines whose
    tallest box reaches ``h1_min`` are level-1 headings, ``h2_min`` level
    2; body text stays out.  Returns (doc_id, pos, level, section,
    heading) — ``pos`` = document order, ``section`` a dotted label
    ('2' / '2.1', level-2 rows numbered within their enclosing level-1
    section; an orphan level-2 before any level-1 gets section '0.n').

    Lines are exact-y groups (real text layers should quantize y
    upstream — the engine's render path emits integral box grids).
    Shape: explode → one (doc_id, y)-keyed agg → two per-doc windows.
    """
    from pyspark.sql import Window

    w_box = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(F.col(boxes_col)).alias("box"),
    ).select(
        "doc_id",
        F.col("box.x").alias("x"), F.col("box.y").alias("y"),
        F.col("box.h").alias("h"), F.col("box.text").alias("text"),
    ).filter(F.col("h") >= h2_min)
    lines = w_box.groupBy("doc_id", "y").agg(
        F.max("h").alias("line_h"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("x", "text"))),
                lambda s: s["text"],
            ),
            " ",
        ).alias("heading"),
    )
    level = F.when(F.col("line_h") >= h1_min, 1).otherwise(2).cast("int")
    w_doc = Window.partitionBy("doc_id").orderBy("y")
    staged = lines.select(
        "doc_id", "y", level.alias("level"), "heading",
        (F.row_number().over(w_doc) - 1).cast("int").alias("pos"),
        F.sum(F.when(level == 1, 1).otherwise(0)).over(w_doc)
        .cast("int").alias("sec"),
    )
    w_sub = Window.partitionBy("doc_id", "sec").orderBy("y")
    return staged.select(
        "doc_id", "pos", "level",
        F.when(F.col("level") == 1, F.col("sec").cast("string"))
        .otherwise(
            F.concat(
                F.col("sec").cast("string"), F.lit("."),
                (F.row_number().over(w_sub)
                 - F.when(F.col("sec") > 0, 1).otherwise(0))
                .cast("string"),
            )
        ).alias("section"),
        "heading",
    )
