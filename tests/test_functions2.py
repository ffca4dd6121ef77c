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
