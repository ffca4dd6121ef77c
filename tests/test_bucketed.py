"""Bucketed-table layout: the joins/aggs on the bucket key must plan with
ZERO Exchange — the physical-plan proof of the co-location contract."""

from __future__ import annotations

from contextlib import contextmanager

import pytest

from pyspark.sql import functions as F

from chug_spark.sources.bucketed import cobucketed_join, read_table, write_bucketed


@contextmanager
def _no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"text {i}", i % 7) for i in range(500)], ["doc_id", "text", "grp"]
    )
    stats = spark.createDataFrame(
        [(i, i * 10) for i in range(0, 500, 2)], ["doc_id", "n_tokens"]
    )
    write_bucketed(docs, "t_docs", str(tmp_path / "docs"), ("doc_id",), 8,
                   sort_cols=("doc_id",))
    write_bucketed(stats, "t_stats", str(tmp_path / "stats"), ("doc_id",), 8,
                   sort_cols=("doc_id",))
    yield "t_docs", "t_stats"
    spark.sql("DROP TABLE IF EXISTS t_docs")
    spark.sql("DROP TABLE IF EXISTS t_stats")


def test_cobucketed_join_zero_exchange(spark, bucketed_pair):
    left, right = bucketed_pair
    with _no_broadcast(spark):
        joined = cobucketed_join(spark, left, right, ["doc_id"])
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == 250

        # groupBy on the bucket key: also exchange-free
        agg = read_table(spark, left).groupBy("doc_id").agg(F.count("*").alias("n"))
        assert "Exchange" not in _plan(agg)

        # control: the same join over plain (non-bucketed) parquet DOES
        # shuffle - proves the assertion above is meaningful
        a = read_table(spark, left).write.mode("overwrite")
        # materialize plain copies
        plain_l = spark.createDataFrame(read_table(spark, left).collect(),
                                        read_table(spark, left).schema)
        plain_r = spark.createDataFrame(read_table(spark, right).collect(),
                                        read_table(spark, right).schema)
        assert "Exchange" in _plan(plain_l.join(plain_r, "doc_id"))


def test_bucketed_join_correctness(spark, bucketed_pair):
    left, right = bucketed_pair
    with _no_broadcast(spark):
        got = {
            (r["doc_id"], r["n_tokens"])
            for r in cobucketed_join(spark, left, right, ["doc_id"]).collect()
        }
    assert got == {(i, i * 10) for i in range(0, 500, 2)}
