"""Round-6 focused edge tests for operators whose internals changed:

- line_dedup_keep_first: restructured to aggregate winners WITH their text
  (no join-back) — a doc whose every line loses must still appear with
  clean_text = '' and n_kept = 0.
- audit_spans: fails CLOSED now — NULL kinds count as unknown, all-NULL
  offsets audit dense=false/ok=false instead of NULL (ADVICE r5).
"""

from pyspark.sql import functions as F

from chug_spark.extract import audit_spans
from chug_spark.ops.dedup import line_dedup_keep_first

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"


def test_line_dedup_all_lines_lost_doc_survives(spark):
    # doc 1 consists ENTIRELY of lines that doc 0 owns first: after the
    # r6 winners-only aggregation it must still emit a row (n_kept=0),
    # not silently vanish with the join-back removed.
    rows = [
        (0, "alpha beta gamma delta echo fox golf hotel", "en", "s0", 40),
        (1, "alpha beta gamma delta echo fox golf hotel", "en", "s0", 40),
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {r["doc_id"]: r.asDict()
           for r in line_dedup_keep_first(docs, line_words=4).collect()}
    assert got[0]["n_kept"] == 2 and got[0]["n_dropped"] == 0
    assert got[1] == {"doc_id": 1, "clean_text": "", "n_kept": 0,
                      "n_dropped": 2}


SPAN_SCHEMA = "doc_id string, offset int, kind string, text string, media_ref string"


def test_audit_spans_null_kind_counts_unknown(spark):
    spans = spark.createDataFrame(
        [("d0", 0, None, "x", None), ("d0", 1, "text", "y", None)],
        SPAN_SCHEMA,
    )
    row = audit_spans(spans).collect()[0]
    assert row["n_unknown"] == 1
    assert row["ok"] is False


def test_audit_spans_all_null_offsets_fail_closed(spark):
    spans = spark.createDataFrame(
        [("d0", None, "text", "x", None), ("d0", None, "text", "y", None)],
        SPAN_SCHEMA,
    )
    row = audit_spans(spans).collect()[0]
    assert row["dense"] is False
    assert row["ok"] is False
