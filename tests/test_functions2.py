"""flatten_nested (P5) + urldir (F12) + md5_pick_index determinism."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from chug_spark.functions import flatten_nested, md5_pick_index, urldir


def test_flatten_nested_merges_and_replaces(spark):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("a", T.IntegerType()),
            T.StructField(
                "nested",
                T.StructType(
                    [T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())]
                ),
            ),
        ]
    )
    df = spark.createDataFrame([("d1", 1, (10, "x"))], schema)
    out = flatten_nested(df, "nested")
    row = out.collect()[0]
    assert set(out.columns) == {"doc_id", "a", "b"}
    assert row["a"] == 10          # replace_existing semantics (filters.py:133)
    assert row["b"] == "x"
    out2 = flatten_nested(df, "nested", remove_original=False)
    assert "nested" in out2.columns


def test_urldir(spark):
    df = spark.createDataFrame(
        [("s3://bkt/dir/sub/file.tar",), ("/a/b/c.tar",)], "url string"
    )
    got = [r[0] for r in df.select(urldir(F.col("url"))).collect()]
    assert got == ["s3://bkt/dir/sub", "/a/b"]


def test_md5_pick_index_uniform_and_stable(spark):
    df = spark.range(200).select(F.col("id").cast("string").alias("k"))
    picked = df.select(md5_pick_index(F.col("k"), F.lit(3)).alias("p"))
    counts = {r["p"]: r["cnt"] for r in picked.groupBy("p").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) == {0, 1, 2}
    assert all(c > 30 for c in counts.values())   # roughly uniform
    again = df.select(md5_pick_index(F.col("k"), F.lit(3)).alias("p")).collect()
    assert [r["p"] for r in picked.collect()] == [r["p"] for r in again]


def test_clean_text_unicode_whitespace(spark):
    """NBSP/NEL/U+2028 are whitespace in Python's \\s — the Spark (?U) class
    must agree (round-1 advice: exact span-equality on unicode raw text)."""
    from pyspark.sql import functions as F

    from chug_spark.functions import clean_text
    import oracle

    samples = [
        "a\xa0b\x85c",            # NBSP + NEL
        " x  y　z", # line/para separators + ideographic space
        " \xa0 padded \xa0 ",
        "mixed \t\xa0\n ws",
        "\x01ctl\x1f kept\x85",   # control chars stripped first
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = [r["c"] for r in df.select(clean_text(F.col("t")).alias("c")).collect()]
    want = [oracle.clean_text(s) for s in samples]
    assert got == want


def test_target_mask_eos_as_pad(spark):
    """prompt_end_token_id == pad_token_id (eos-as-pad tokenizers): the
    reference searches the already pad-masked target, finds nothing, and
    masks only index 0 — NOT through the last pad position
    (ref text/tokenization.py:26,36)."""
    from pyspark.sql import functions as F

    from chug_spark.functions import text_input_to_target

    df = spark.createDataFrame([([5, 9, 7, 0, 0],)], "ids array<int>")
    out = df.select(
        text_input_to_target(F.col("ids"), pad_token_id=0,
                             prompt_end_token_id=0).alias("t")
    ).collect()[0]["t"]
    # pads → -100; prompt-end==pad not found in masked ids → only idx 0 masked
    assert out == [-100, 9, 7, -100, -100]

    # normal case unchanged: end token 9 at idx 1 masks through idx 1
    out2 = df.select(
        text_input_to_target(F.col("ids"), pad_token_id=0,
                             prompt_end_token_id=9).alias("t")
    ).collect()[0]["t"]
    assert out2 == [-100, -100, 7, -100, -100]


def test_make_tokenize_udf_batches_whole_arrow_batch(spark):
    """The production tokenizer slot must call the tokenizer ONCE per Arrow
    batch with a list of strings (HF fast-tokenizer batch encode), and honor
    the dict-return interface."""
    from pyspark.sql import functions as F

    from chug_spark.text.tokenization import make_tokenize_udf

    def factory():
        def stub(texts, add_special_tokens, max_length, padding, truncation):
            assert isinstance(texts, list), "must batch-encode a list"
            assert add_special_tokens is False and padding == "max_length"
            out = []
            for t in texts:
                ids = [ord(c) - 90 for c in t][:max_length]
                ids += [0] * (max_length - len(ids))
                out.append(ids)
            return {"input_ids": out}  # HF BatchEncoding-style dict
        return stub

    tok = make_tokenize_udf(factory, max_length=6)
    df = spark.createDataFrame([("abc",), ("defgh",), ("",)], "t string")
    got = {r["t"]: r["ids"] for r in df.select("t", tok(F.col("t")).alias("ids")).collect()}
    assert got["abc"] == [7, 8, 9, 0, 0, 0]
    assert got["defgh"] == [10, 11, 12, 13, 14, 0]
    assert got[""] == [0, 0, 0, 0, 0, 0]
