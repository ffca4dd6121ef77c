"""Scalar/projection operators (SURVEY.md §2.2/§2.8) + tokenization."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from chug_spark.functions import (
    base_plus_ext,
    clean_text,
    file_extension,
    prompt_end_pos,
    text_input_to_target,
)
from chug_spark.text.tokenization import (
    prepare_text_input_cols,
    tokenize_col,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_base_plus_ext_matches_reference_regex(spark):
    # reference regex BASE_RE (tariterators.py:8): split off ALL extensions
    df = spark.createDataFrame(
        [("dir/name.tar.gz",), ("a/b/c.json",), ("noext",), ("d/x.PDF",)], "path string"
    )
    base, ext = base_plus_ext(F.col("path"))
    rows = df.select(base.alias("b"), ext.alias("e")).collect()
    assert (rows[0]["b"], rows[0]["e"]) == ("dir/name", "tar.gz")
    assert (rows[1]["b"], rows[1]["e"]) == ("a/b/c", "json")
    assert (rows[2]["b"], rows[2]["e"]) == ("", "")  # no match → empty
    assert (rows[3]["b"], rows[3]["e"]) == ("d/x", "PDF")


def test_file_extension(spark):
    assert _one(spark, file_extension(F.lit("x/y.tar.gz"))) == "gz"
    assert _one(spark, file_extension(F.lit("name.PDF"))) == "PDF"


def test_clean_text(spark):
    assert _one(spark, clean_text(F.lit("  a\t b\n\nc\x00d  "))) == "a b cd"


def test_prompt_end_pos_last_occurrence(spark):
    # reference prompt_end_pos: LAST index of the token (tokenization.py:7-9)
    arr = F.array(*[F.lit(x) for x in [5, 9, 3, 9, 2]])
    assert _one(spark, prompt_end_pos(arr, 9)) == 3
    assert _one(spark, prompt_end_pos(arr, 7)) == 0       # absent → default 0
    assert _one(spark, prompt_end_pos(arr, 7, -1)) == -1  # custom default


def test_target_masking(spark):
    # pad→-100 everywhere; everything up to LAST prompt-end inclusive →-100
    ids = F.array(*[F.lit(x) for x in [4, 9, 6, 9, 7, 0, 0]])
    got = _one(spark, text_input_to_target(ids, pad_token_id=0, prompt_end_token_id=9))
    assert got == [-100, -100, -100, -100, 7, -100, -100]
    # no prompt-end token present → index 0 masked (empty_default=0 semantics)
    ids2 = F.array(*[F.lit(x) for x in [4, 6, 7, 0]])
    got2 = _one(spark, text_input_to_target(ids2, pad_token_id=0, prompt_end_token_id=9))
    assert got2 == [-100, 6, 7, -100]
    # no prompt token configured → only pad masking (tokenization.py:27-28)
    got3 = _one(spark, text_input_to_target(ids2, pad_token_id=0))
    assert got3 == [4, 6, 7, -100]


def test_tokenize_pad_truncate(spark):
    ids = _one(spark, tokenize_col(F.lit("ab abc a"), max_length=5, pad_id=0))
    assert ids == [2, 3, 1, 0, 0]
    ids = _one(spark, tokenize_col(F.lit("ab abc a"), max_length=2, pad_id=0))
    assert ids == [2, 3]  # truncation=True


def test_prepare_text_input_cols(spark):
    cols = prepare_text_input_cols(
        F.lit("hi there"), max_length=6, pad_id=0,
        task_start_token="<s>", eos_token="</s>",
    )
    df = spark.range(1).select(cols["text_input"].alias("i"), cols["text_target"].alias("t"))
    row = df.collect()[0]
    # "<s>hi there </s>" → words ["<s>hi","there","</s>"] → [5%97,5,4] padded
    assert row["i"] == [5, 5, 4, 0, 0, 0]
    assert row["t"] == [5, 5, 4, -100, -100, -100]  # pads masked
