"""HTML table extraction (ops/tables.py)."""

from chug_spark.ops.tables import extract_tables


def _grid(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return sorted(
        (r.table_no, r.row_no, r.col_no, r.is_header, r.cell)
        for r in extract_tables(df).collect()
    )


def test_thead_tbody_wrappers_are_transparent(spark):
    html = ("<table><thead><tr><th>H1</th><th>H2</th></tr></thead>"
            "<tbody><tr><td>a</td><td>b</td></tr></tbody></table>")
    assert _grid(spark, html) == [
        (0, 0, 0, True, "H1"),
        (0, 0, 1, True, "H2"),
        (0, 1, 0, False, "a"),
        (0, 1, 1, False, "b"),
    ]


def test_ragged_rows_attrs_markup_and_no_tables(spark):
    html = ('<table class="wide"><tr><td colspan="2">span</td></tr>'
            "<tr><td><i>em</i> x</td><td>y</td></tr></table>")
    assert _grid(spark, html) == [
        (0, 0, 0, False, "span"),
        (0, 1, 0, False, "em x"),
        (0, 1, 1, False, "y"),
    ]
    assert _grid(spark, "<p>prose only</p>") == []
    assert _grid(spark, None) == []


def test_multiple_tables_number_independently(spark):
    html = ("<table><tr><td>t0</td></tr></table>"
            "<table><tr><td>t1</td></tr></table>")
    assert _grid(spark, html) == [
        (0, 0, 0, False, "t0"),
        (1, 0, 0, False, "t1"),
    ]
