"""Task pipelines: VQA prompt assembly, image-text filter/rename, gtparse,
manual (reference task_pipeline/* and doc_vqa_processor.py)."""

import pandas as pd
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from chug_spark.config import VqaTaskCfg
from chug_spark.determinism import stable_hash64
from chug_spark.tasks.docvqa import build_vqa
from chug_spark.tasks.gtparse import build_gtparse
from chug_spark.tasks.imagetext import build_image_text
from chug_spark.tasks.manual import build_manual, safe_map

VQA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("question", T.StringType()),
        T.StructField("query", T.StringType()),
        T.StructField("question_id", T.IntegerType()),
        T.StructField("answers", T.ArrayType(T.StringType())),
    ]
)


def test_vqa_prompt_and_fallback(spark):
    rows = [
        ("d1", "What?", None, 7, ["a1", "a2", "a3"]),
        ("d2", None, "Which?", 8, ["only"]),
    ]
    out = {r["doc_id"]: r for r in build_vqa(
        spark.createDataFrame(rows, VQA_SCHEMA)).collect()}
    # fallback question;query (constants.py:4): d2 uses 'query'
    assert out["d2"]["question"] == "Which?"
    assert out["d2"]["answer"] == "only"
    assert out["d2"]["text_input"] == "<s_question>Which?</s_question><s_answer>only</s_answer>"
    # d1: deterministic md5-based answer pick, prompt assembled around it
    a = out["d1"]["answer"]
    assert a in {"a1", "a2", "a3"}
    assert out["d1"]["text_input"] == f"<s_question>What?</s_question><s_answer>{a}</s_answer>"


def test_vqa_no_target_prompt_ends_open(spark):
    """include_target=False → prompt ends at answer_prefix
    (doc_vqa_processor.py:82-84: answer part only when answer chosen)."""
    rows = [("d1", "Q", None, 1, ["a"])]
    out = build_vqa(
        spark.createDataFrame(rows, VQA_SCHEMA), VqaTaskCfg(include_target=False)
    ).collect()[0]
    assert out["text_input"] == "<s_question>Q</s_question><s_answer>"
    assert out["answer"] is None


IT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("jpg", T.StringType()),
        T.StructField("png", T.StringType()),
        T.StructField("txt", T.StringType()),
    ]
)


def test_image_text_filter_and_rename(spark):
    rows = [
        ("d1", "img1", None, "cap1"),   # jpg + txt → kept
        ("d2", None, "img2", "cap2"),   # png fallback → kept
        ("d3", None, None, "cap3"),     # no image → dropped
        ("d4", "img4", None, None),     # no text → dropped
    ]
    out = build_image_text(spark.createDataFrame(rows, IT_SCHEMA))
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {"d1", "d2"}
    assert got["d1"]["image_input"] == "img1"
    assert got["d2"]["image_input"] == "img2"     # coalesce fallback jpg;png;...
    assert got["d1"]["text"] == "cap1"
    assert set(out.columns) == {"doc_id", "image_input", "text"}  # keep=False


def test_gtparse_uses_ground_truth_key(spark):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("jpg", T.StringType()),
            T.StructField("ground_truth", T.StringType()),
        ]
    )
    rows = [("d1", "img", '{"gt_parse": {}}'), ("d2", None, "x")]
    out = build_gtparse(spark.createDataFrame(rows, schema))
    got = out.collect()
    assert len(got) == 1 and got[0]["ground_truth"] == '{"gt_parse": {}}'


def test_manual_task_safe_map_skips_errors(spark):
    schema = T.StructType([T.StructField("doc_id", T.StringType()),
                           T.StructField("val", T.IntegerType())])
    df = spark.createDataFrame([("a", 2), ("b", 0), ("c", 5)], schema)

    def per_row(row):
        if row["val"] == 0:
            raise ValueError("bad")
        return {"doc_id": row["doc_id"], "doubled": row["val"] * 2}

    out_schema = T.StructType([T.StructField("doc_id", T.StringType()),
                               T.StructField("doubled", T.IntegerType())])
    out = build_manual(df, safe_map(per_row, ["doc_id", "doubled"]), out_schema)
    got = sorted((r["doc_id"], r["doubled"]) for r in out.collect())
    assert got == [("a", 4), ("c", 10)]  # 'b' skipped (log_and_continue)


def test_vqa_filter_missing(spark):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("png", T.StringType()),
            T.StructField("question", T.StringType()),
            T.StructField("answers", T.ArrayType(T.StringType())),
        ]
    )
    rows = [
        ("d1", "img", "q?", ["a"]),
        ("d2", None, "q?", ["a"]),      # no image
        ("d3", "img", None, ["a"]),     # no question
        ("d4", "img", "q?", None),      # no answer
    ]
    from chug_spark.tasks.docvqa import filter_missing

    kept = [r["doc_id"] for r in filter_missing(spark.createDataFrame(rows, schema)).collect()]
    assert kept == ["d1"]


def test_vqa_resolve_media_ref(spark):
    from chug_spark import media as media_mod
    from chug_spark.tasks.docvqa import resolve_media_ref

    payload = media_mod.make_payload_ref("L", 3, 11)
    df = spark.createDataFrame(
        [("d1", "page:pre"), ("d2", payload)], "doc_id string, media_ref string"
    )
    got = {r["doc_id"]: r["image_ref"]
           for r in resolve_media_ref(df, render_dpi=12).collect()}
    assert got["d1"] == "page:pre"                       # passthrough
    expected, _ = media_mod.decode_media_pages(payload, "L", [0], 12)
    assert got["d2"] == expected[0]                      # rendered page 0
