"""Unicode normalization (ftfy-lite): mojibake repair, punctuation folds,
control/zero-width stripping, idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from chug_spark.ops.textnorm import text_normalize

RQ = "â€\x9d"  # mojibake of ” (ends in raw U+009D)


def _norm1(spark, s):
    df = spark.createDataFrame([(0, s)], "doc_id long, text string")
    return text_normalize(df).collect()[0]


def test_mojibake_repair_and_fold(spark):
    r = _norm1(
        spark,
        "Itâ€™s â€œfine" + RQ
        + " â€” said CafÃ© MuÃ±ozâ€¦",
    )
    assert r["text_norm"] == "It's \"fine\" - said Café Muñoz..."
    assert r["changed"]


def test_typographic_fold_without_mojibake(spark):
    r = _norm1(spark, "‘quoted’ — dash… and nbsp")
    assert r["text_norm"] == "'quoted' - dash... and nbsp"


def test_control_and_zero_width_strip(spark):
    r = _norm1(spark, "a​b﻿c\x01d\x07e  f\tg")
    assert r["text_norm"] == "abc d e f g"


def test_clean_text_unchanged_and_null_safe(spark):
    df = spark.createDataFrame(
        [(1, "already clean text"), (2, None), (3, "  pad  ")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text_normalize(df).collect()}
    assert rows[1]["text_norm"] == "already clean text" and not rows[1]["changed"]
    assert rows[2]["text_norm"] is None and not rows[2]["changed"]
    assert rows[3]["text_norm"] == "pad" and rows[3]["changed"]


def test_normalize_idempotent(spark):
    dirty = [
        "Itâ€™s â€œok" + RQ,
        "x​y — z…",
        "CafÃ©\x01",
    ]
    df = spark.createDataFrame(list(enumerate(dirty)), "doc_id long, text string")
    once = text_normalize(df).select(
        "doc_id", F.col("text_norm").alias("text")
    )
    twice = text_normalize(once)
    assert twice.filter(F.col("changed")).count() == 0


def test_text_normalize_is_map_only(spark):
    df = spark.createDataFrame(
        [(i, f"row {i}") for i in range(10)], "doc_id long, text string"
    )
    plan = text_normalize(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
