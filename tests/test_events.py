"""Event operators: gap sessionization and as-of join edge semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from chug_spark.ops.events import asof_attach_last_mark, sessionize

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 0, minute, second, micro)


def _events(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_sessionize_gap_boundaries(spark):
    rows = [
        # user 1: events at 0, 29m59s (same session), 60m01s-from-prev (new)
        (1, _ts(0), 1, "view", 1.0),
        (2, _ts(29, 59), 1, "view", 2.0),
        (3, dt.datetime(2024, 1, 1, 1, 30, 0), 1, "view", 3.0),
        # exactly gap (30m) later: NOT a new session (> is strict)
        (4, dt.datetime(2024, 1, 1, 2, 0, 0), 1, "view", 4.0),
        # user 2: single event
        (5, _ts(5), 2, "click", 10.0),
    ]
    out = {
        (r["user_id"], r["session_no"]): (r["n_events"], r["value_cents"])
        for r in sessionize(_events(spark, rows), gap_minutes=30).collect()
    }
    assert out == {
        (1, 1): (2, 300),   # events 1+2
        (1, 2): (2, 700),   # events 3+4 (exactly-30m gap stays in session)
        (2, 1): (1, 1000),
    }


def test_asof_last_mark_semantics(spark):
    rows = [
        (1, _ts(0), 1, "view", 0.0),          # before any mark -> NULL
        (2, _ts(1), 1, "error", 0.0),          # mark; matches itself
        (3, _ts(2), 1, "view", 0.0),           # -> mark 2
        (4, _ts(3), 1, "error", 0.0),          # newer mark
        (5, _ts(3), 1, "view", 0.0),           # same-ts as mark 4 -> mark 4
        (6, _ts(9), 1, "view", 0.0),           # -> mark 4
        (7, _ts(5), 2, "view", 0.0),           # other user, no marks -> NULL
    ]
    out = {
        r["event_id"]: (r["last_mark_id"], r["us_since_mark"])
        for r in asof_attach_last_mark(_events(spark, rows)).collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (2, 0)          # mark matches itself
    assert out[3] == (2, 60_000_000)
    assert out[5] == (4, 0)          # inclusive at equal timestamps
    assert out[6] == (4, 360_000_000)
    assert out[7] == (None, None)


def test_asof_single_shuffle_plan(spark):
    """The union+window formulation must cost exactly ONE exchange (on
    user_id) — the point of avoiding a range join."""
    rows = [(i, _ts(i % 9), i % 3, "error" if i % 4 == 0 else "view", 0.0)
            for i in range(40)]
    plan = (
        asof_attach_last_mark(_events(spark, rows))
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_exchanges = plan.count("Exchange hashpartitioning")
    # one for the window; the mark-dedup groupBy reuses the same partitioning
    # on (user_id, tus) only if keys align — allow <= 2, never a broadcast
    # nested loop / cartesian
    assert n_exchanges <= 2
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_stratified_sample_fractions(spark):
    from chug_spark.ops.dataflow import stratified_sample

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(2000)],
        ["doc_id", "lang"],
    )
    out = stratified_sample(docs, {"en": 0.1, "de": 0.9}, key="lang")
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 60 <= counts["en"] <= 140        # ~100 of 1000
    assert 820 <= counts["de"] <= 960       # ~900 of 1000
    # determinism across invocations/parallelism
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(docs.repartition(7), {"en": 0.1, "de": 0.9}).collect()
    )
    assert a == b
