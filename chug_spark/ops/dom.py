"""DOM-tree main-content extraction (readability-style container scoring).

The regex leg (:mod:`chug_spark.ops.html`) is the oracle-checkable fast
path; this module is the DOM-heuristics leg the north rule names: a real
parse tree (stdlib ``html.parser`` — no external deps, CDATA-correct for
``<script>``/``<style>`` bodies), subtree-aware boilerplate removal, and
readability-style scoring — each paragraph-like block contributes
``1 + commas + min(len/100, 3)`` points to its parent and half to its
grandparent, candidates are damped by link density, the best container
wins (Arc90 readability algorithm family; same heuristic lineage as
jusText/trafilatura).

Spark-side this is ONE Arrow-batched ``mapInPandas`` pass — a pure map
with no shuffle, so it pipelines behind the scan and scales linearly; a
giant page costs O(page bytes) like the PDF render path, and upstream
page-size capping is the skew control.  All tree walks are iterative
(explicit stacks): adversarially deep nesting cannot hit the Python
recursion limit inside an executor.

Reference parity: chug has no HTML leg (PDF/image docs only); this op
extends the extraction triad to web corpora while emitting the same
doc-granular contract as :func:`chug_spark.ops.html.html_main_content`.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: subtrees that are boilerplate by construction (superset of the regex leg:
#: a real tree lets us also kill form/iframe/svg/template safely)
DROP_TAGS = frozenset(
    "script style noscript nav header footer aside form iframe svg template head".split()
)
#: void elements: never pushed on the open stack
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
#: paragraph-like block units that donate readability points
_BLOCK = frozenset("p pre td blockquote li h1 h2 h3 h4 h5 h6".split())
#: containers eligible to win
_CANDIDATE = frozenset("div article section main body td ul ol".split())

_WS = re.compile(r"\s+")


def _norm(s: str) -> str:
    return _WS.sub(" ", s).strip()


class _Node:
    __slots__ = ("tag", "nid", "parent", "seq", "order", "score")

    def __init__(self, tag: str, nid: str | None, parent: "_Node | None", order: int):
        self.tag = tag
        self.nid = nid
        self.parent = parent
        self.seq: list = []  # ordered ('t', str) | ('n', _Node) items
        self.order = order
        self.score = 0.0


class _TreeParser(HTMLParser):
    """Tolerant tree builder: unclosed tags close implicitly, stray end
    tags are ignored, DROP_TAGS subtrees are skipped wholesale."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", None, None, 0)
        self.stack = [self.root]
        self.title_parts: list[str] = []
        self._n = 0
        # open elements inside the dropped region, bottom entry = the
        # outermost DROP_TAGS element itself (nested drop tags and ordinary
        # tags are plain entries); non-empty ⇔ currently dropping
        self._drop_stack: list[str] = []
        self._title = 0

    def handle_starttag(self, tag, attrs):
        if tag == "title":
            self._title += 1
            return
        if self._drop_stack:
            if tag not in _VOID:
                self._drop_stack.append(tag)
            return
        if tag in DROP_TAGS:
            self._drop_stack.append(tag)
            return
        if tag in _VOID:
            return
        self._n += 1
        node = _Node(tag, dict(attrs).get("id"), self.stack[-1], self._n)
        self.stack[-1].seq.append(("n", node))
        self.stack.append(node)

    def handle_endtag(self, tag):
        if tag == "title":
            self._title = max(0, self._title - 1)
            return
        if tag in _VOID:
            return
        if self._drop_stack:
            # Well-formed close of an element opened inside the dropped
            # region: pop it and its implicitly-closed children.  Popping
            # the bottom entry (the DROP_TAGS element itself) ends the drop.
            for i in range(len(self._drop_stack) - 1, -1, -1):
                if self._drop_stack[i] == tag:
                    del self._drop_stack[i:]
                    return
            # Otherwise: an end tag matching an element open OUTSIDE the
            # dropped region means the DROP_TAGS element was never closed
            # (common malformed HTML, e.g. an unclosed <form>).  The
            # ancestor's close implicitly terminates the dropped subtree —
            # without this, the drop persists forever and the rest of the
            # document is silently discarded.
            if any(n.tag == tag for n in self.stack[1:]):
                self._drop_stack.clear()
            else:
                return
        if tag in DROP_TAGS:
            return  # stray close of a drop tag that was never open
        # close the innermost matching open tag (implicitly closing children)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore

    def handle_data(self, data):
        if self._title:
            self.title_parts.append(data)
            return
        if self._drop_stack or not data:
            return
        self.stack[-1].seq.append(("t", data))


def _subtree_stats(root: _Node) -> dict[_Node, tuple[int, int, int]]:
    """post-order (text_len, link_len, commas) of each node's full subtree,
    computed iteratively."""
    stats: dict[_Node, tuple[int, int, int]] = {}
    stack: list[tuple[_Node, bool]] = [(root, False)]
    while stack:
        node, done = stack.pop()
        if not done:
            stack.append((node, True))
            for kind, item in node.seq:
                if kind == "n":
                    stack.append((item, False))
            continue
        t = l = c = 0
        for kind, item in node.seq:
            if kind == "t":
                frag = _norm(item)
                t += len(frag)
                c += frag.count(",")
            else:
                kt, kl, kc = stats[item]
                t += kt
                c += kc
                l += kt if item.tag == "a" else kl
        stats[node] = (t, l, c)
    return stats


def _subtree_text(node: _Node) -> str:
    """document-order text of a subtree (iterative iterator stack: O(n),
    whitespace-collapsed)"""
    parts: list[str] = []
    stack = [iter(node.seq)]
    while stack:
        try:
            kind, item = next(stack[-1])
        except StopIteration:
            stack.pop()
            continue
        if kind == "t":
            parts.append(item)
        else:
            stack.append(iter(item.seq))
    return _norm(" ".join(parts))


def _outer_blocks(node: _Node) -> list[_Node]:
    """outermost _BLOCK descendants in document order"""
    out: list[_Node] = []
    stack = [iter(node.seq)]
    while stack:
        try:
            kind, item = next(stack[-1])
        except StopIteration:
            stack.pop()
            continue
        if kind != "n":
            continue
        if item.tag in _BLOCK:
            out.append(item)  # outermost: don't descend further
        else:
            stack.append(iter(item.seq))
    return out


def _path(node: _Node) -> str:
    parts = []
    cur: _Node | None = node
    while cur is not None and cur.tag != "#root":
        parts.append(cur.tag + (f"#{cur.nid}" if cur.nid else ""))
        cur = cur.parent
    return "/".join(reversed(parts))


def extract_one(html: str | None, min_block_chars: int = 25):
    """(title, best_path, score, n_blocks, main_text) for one page.

    Deterministic: same bytes in, same values out — the md5 pin in
    tests/test_hash_pins.py is the value gate the driver can't run in SQL.
    """
    p = _TreeParser()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass  # salvage whatever the tree holds; malformed tails are dropped
    title = _norm(" ".join(p.title_parts))
    stats = _subtree_stats(p.root)

    # every paragraph-like block donates points to parent + grandparent
    order: list[_Node] = []
    stack = [iter(p.root.seq)]
    while stack:
        try:
            kind, item = next(stack[-1])
        except StopIteration:
            stack.pop()
            continue
        if kind != "n":
            continue
        order.append(item)
        stack.append(iter(item.seq))
    for node in order:
        if node.tag not in _BLOCK:
            continue
        t, _, c = stats[node]
        if t < min_block_chars:
            continue
        pts = 1.0 + c + min(t // 100, 3)
        if node.parent is not None:
            node.parent.score += pts
            if node.parent.parent is not None:
                node.parent.parent.score += pts / 2.0

    best = None
    best_final = 0.0
    for node in order:
        if node.score <= 0.0 or node.tag not in _CANDIDATE:
            continue
        t, l, _ = stats[node]
        final = node.score * (1.0 - (l / t if t else 1.0))
        if final > best_final + 1e-9:  # doc-order tie-break: first wins
            best, best_final = node, final

    if best is None:
        # no scoring container (plain text, fragment, exotic nesting):
        # readability's classic fallback — the whole cleaned body text
        return title, None, 0.0, 0, _subtree_text(p.root)
    blocks = [
        b for b in _outer_blocks(best) if len(_subtree_text(b)) >= min_block_chars
    ]
    main_text = "\n".join(_subtree_text(b) for b in blocks)
    if not blocks:  # candidate scored via grandchild blocks nested in odd tags
        main_text = _subtree_text(best)
    return title, _path(best), round(best_final, 4), len(blocks), main_text


def dom_extract(
    docs: DataFrame, html_col: str = "html", repartition: int | None = None
) -> DataFrame:
    """(doc_id, title, best_path, score, n_blocks, main_text) per page via
    the readability-style DOM scorer — one Arrow-batched mapInPandas map.

    Pure map by default: no shuffle, pipelines behind the scan (a
    well-partitioned production corpus needs nothing else).  Pass
    ``repartition=N`` only when the INPUT's split fan-out is degenerate —
    e.g. a single-row-group parquet file or an AQE-coalesced tiny relation,
    which would serialize the whole tree-parse loop on one core (measured
    3x on media_dhash, and the entire dom_extract wall at 5000 docs).
    That is a property of the fixture/source, so the knob lives with the
    caller, not baked into the operator."""
    import pandas as pd

    src = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(html_col).alias("html"),
    )
    if repartition:
        src = src.repartition(repartition, "doc_id")

    def run(batches):
        for pdf in batches:
            rows = [extract_one(h) for h in pdf["html"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "title": [r[0] for r in rows],
                    "best_path": [r[1] for r in rows],
                    "score": [r[2] for r in rows],
                    "n_blocks": [r[3] for r in rows],
                    "main_text": [r[4] for r in rows],
                }
            )

    return src.mapInPandas(
        run,
        "doc_id long, title string, best_path string, score double, "
        "n_blocks int, main_text string",
    )
