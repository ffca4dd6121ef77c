"""HTML table extraction: pages → one row per cell, preserving table/row/
column coordinates — the structured-data side of main-content extraction
(tables feed QA/table-to-text corpora; the prose path is ops/html.py).

Pipeline shape: three nested ``regexp_extract_all`` + ``posexplode``
levels (table → tr → th/td), then a tag-strip + whitespace-normalize on
the cell body.  All map-only Column work — the explodes multiply rows but
never shuffle; per-page fan-out is bounded by page size, which upstream
ingestion already caps (WARC/tar shard framing).  Nested tables: the
non-greedy ``<table.*?</table>`` match closes at the FIRST ``</table>``,
so an inner table's cells attribute to the outer table's coordinate space
once — the standard flat-scan tradeoff (documented; a DOM pass is the
ops/dom.py altitude, not this one).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tag-name boundary lookaheads: <th must not match <thead>, <tr must not
# match <track> — the thead/tbody wrappers real tables use are transparent
# (tr rows are found inside them; the wrappers themselves never match)
_TABLE_RE = r"(?is)<table(?=[\s>])[^>]*>.*?</table>"
_TR_RE = r"(?is)<tr(?=[\s>])[^>]*>.*?</tr>"
_CELL_RE = r"(?is)<t[hd](?=[\s>])[^>]*>.*?</t[hd]\s*>"
_TH_PREFIX_RE = r"(?is)^<th[\s>]"


def _clean(cell: Column) -> Column:
    txt = F.regexp_replace(cell, r"(?is)<[^>]*>", " ")
    return F.trim(F.regexp_replace(txt, r"\s+", " "))


def extract_tables(
    df: DataFrame, html_col: str = "html", key_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """(…key_cols, table_no, row_no, col_no, is_header, cell) — one row per
    ``<th>``/``<td>`` cell.  ``is_header`` marks ``<th>`` cells (the usual
    column-name row).  Pages without tables emit nothing (inner explodes);
    ragged rows keep their own cell counts — col_no is position within the
    row, not a rectangular grid index."""
    tables = F.regexp_extract_all(
        F.coalesce(F.col(html_col), F.lit("")), F.lit(_TABLE_RE), 0
    )
    t = df.select(*key_cols, F.posexplode(tables).alias("table_no", "tbl"))
    rows = t.select(
        *key_cols, "table_no",
        F.posexplode(
            F.regexp_extract_all(F.col("tbl"), F.lit(_TR_RE), 0)
        ).alias("row_no", "tr"),
    )
    cells = rows.select(
        *key_cols, "table_no", "row_no",
        F.posexplode(
            F.regexp_extract_all(F.col("tr"), F.lit(_CELL_RE), 0)
        ).alias("col_no", "cell_raw"),
    )
    return cells.select(
        *key_cols,
        F.col("table_no").cast("int").alias("table_no"),
        F.col("row_no").cast("int").alias("row_no"),
        F.col("col_no").cast("int").alias("col_no"),
        F.regexp_like(F.col("cell_raw"), F.lit(_TH_PREFIX_RE)).alias("is_header"),
        _clean(F.col("cell_raw")).alias("cell"),
    )
