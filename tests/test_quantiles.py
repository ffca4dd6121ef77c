"""Exact histogram-based quantile binning (ops/quantiles.py): threshold
rule, tie handling, NULL drop, partition invariance."""

from pyspark.sql import functions as F

from chug_spark.ops.quantiles import (
    assign_quantile_bins,
    value_quantile_thresholds,
)


def _df(spark, vals, parts=1):
    rows = [(i, v) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "doc_id long, score int").repartition(parts)


def test_threshold_rule_exact(spark):
    # 10 values 1..10, quartiles: t_k = min{v : cum*4 >= k*10}
    # k=1: cum>=2.5 -> v=3 ; k=2: cum>=5 -> v=5 ; k=3: cum>=7.5 -> v=8
    df = _df(spark, list(range(1, 11)))
    ts = value_quantile_thresholds(df, "score", 4).collect()[0]["ts"]
    assert ts == [3, 5, 8]


def test_bins_are_value_contiguous_and_cover_range(spark):
    df = _df(spark, list(range(1, 11)))
    got = {
        r["doc_id"]: r["bin"]
        for r in assign_quantile_bins(df, "score", 4).collect()
    }
    # v <= 3 -> bin1, 4..5 -> bin2, 6..8 -> bin3, 9..10 -> bin4
    bins = [got[i] for i in range(10)]  # doc i has score i+1
    assert bins == [1, 1, 1, 2, 2, 3, 3, 3, 4, 4]


def test_ties_never_split(spark):
    # 8 copies of the same value + 2 outliers: the tie lands in ONE bin
    df = _df(spark, [5] * 8 + [1, 9])
    rows = assign_quantile_bins(df, "score", 4).collect()
    tie_bins = {r["bin"] for r in rows if r["score"] == 5}
    assert len(tie_bins) == 1


def test_null_scores_dropped(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 20)], "doc_id long, score int"
    )
    rows = assign_quantile_bins(df, "score", 2).collect()
    assert {r["doc_id"] for r in rows} == {1, 3}


def test_partition_invariance(spark):
    vals = [((i * 37) % 101) for i in range(200)]
    a = assign_quantile_bins(_df(spark, vals, parts=1), "score", 10)
    b = assign_quantile_bins(_df(spark, vals, parts=7), "score", 10)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_plan_has_no_global_sort_on_rows(spark):
    # the only Sort allowed is inside the bounded-histogram window, never a
    # corpus-wide Exchange+Sort for rank assignment
    df = _df(spark, list(range(100)), parts=4)
    plan = assign_quantile_bins(df, "score", 10)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan