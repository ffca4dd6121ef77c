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
        # exactly gap (30m) later: NEW session (half-open intervals, same
        # semantics as Spark's built-in session_window)
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
        (1, 2): (1, 300),   # event 3
        (1, 3): (1, 400),   # event 4 (exactly-30m gap opens a new session)
        (2, 1): (1, 1000),
    }


def test_sessionize_matches_builtin_session_window(spark):
    """The lag-cumsum batch formulation and Spark's built-in session_window
    must produce the same sessions (start, n_events, cents) on the real
    events table."""
    from chug_spark.streaming.windows import session_counts

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ours = {
        (r["user_id"], r["start_us"]): (r["n_events"], r["value_cents"])
        for r in sessionize(events, gap_minutes=30).collect()
    }
    theirs = {
        (r["user_id"], int(r["session_start"].timestamp() * 1_000_000)): (
            r["n_events"],
            r["value_cents"],
        )
        for r in session_counts(events, gap_minutes=30).collect()
    }
    assert ours == theirs and len(ours) > 100


def test_streaming_session_counts(spark, tmp_path):
    """Streaming sessionization (watermark + session_window + availableNow)
    equals the batch result over the same files."""
    import os

    from chug_spark.streaming.windows import run_stream_session_counts, session_counts

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    in_dir = str(tmp_path / "in")
    events.repartition(4).write.mode("overwrite").parquet(in_dir)
    out_dir = str(tmp_path / "out")
    run_stream_session_counts(spark, in_dir, out_dir, gap_minutes=30,
                              watermark="0 seconds")
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["value_cents"])
        for r in spark.read.parquet(os.path.join(out_dir, "sessions")).collect()
    }
    want = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["value_cents"])
        for r in session_counts(events, gap_minutes=30).collect()
    }
    # append mode only emits sessions the final watermark has passed; with
    # availableNow + 0s watermark that is everything except sessions still
    # open at max(ts) - allow the boundary session per user to be absent
    assert set(got).issubset(set(want))
    assert all(want[k] == v for k, v in got.items())
    assert len(got) >= len(want) - events.select("user_id").distinct().count()


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


def test_sessionize_presplit_equals_plain(spark):
    """Two-phase skew-safe sessionize equals plain sessionize row-for-row,
    including sessions spanning many chunk boundaries (a continuous stream
    of events 1 minute apart across 3 chunk widths = ONE session)."""
    import random

    from chug_spark.ops.events import sessionize_presplit

    rng = random.Random(23)
    rows = []
    eid = 0
    # random sparse events for 3 users
    for _ in range(300):
        rows.append((eid, dt.datetime(2024, 1, 1)
                     + dt.timedelta(seconds=rng.randrange(0, 6 * 86400)),
                     rng.randrange(3), "view", 1.0))
        eid += 1
    # one continuous run crossing several 6h chunk boundaries (user 7)
    for k in range(30 * 60):
        rows.append((eid, dt.datetime(2024, 1, 2) + dt.timedelta(minutes=k),
                     7, "view", 1.0))
        eid += 1
    events = _events(spark, rows)

    def key(df):
        return {
            (r["user_id"], r["session_no"]): (
                r["start_us"], r["end_us"], r["n_events"], r["value_cents"])
            for r in df.collect()
        }

    plain = key(sessionize(events, gap_minutes=30))
    split = key(sessionize_presplit(events, gap_minutes=30, split_hours=6))
    assert plain == split
    # the continuous run is exactly one session despite crossing chunks
    u7 = [k for k in plain if k[0] == 7]
    assert len(u7) == 1 and plain[u7[0]][2] == 30 * 60


def test_salted_join_balances_hot_key(spark):
    """salted_join returns exactly the plain join's rows, and the hot key's
    rows actually spread across salt buckets (the skew fix it exists for)."""
    from pyspark.sql import functions as F

    from chug_spark.ops.dataflow import salted_join

    # 10k rows on ONE hot key + 100 spread over others
    large = spark.createDataFrame(
        [(0, i) for i in range(10_000)] + [(k, -k) for k in range(1, 101)],
        ["k", "payload"],
    )
    small = spark.createDataFrame([(k, f"dim{k}") for k in range(101)], ["k", "dim"])
    got = salted_join(large, small, "k")
    want = large.join(small, "k")
    assert got.count() == want.count() == 10_100
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}

    # the hot key's rows occupy all salt buckets (balance, not cosmetics)
    salted = large.withColumn(
        "_salt", F.pmod(F.xxhash64("k", "payload"), F.lit(8))
    ).filter(F.col("k") == 0)
    n_buckets = salted.select("_salt").distinct().count()
    assert n_buckets == 8
    counts = [r["n"] for r in salted.groupBy("_salt").agg(F.count("*").alias("n")).collect()]
    assert max(counts) < 10_000 * 0.25  # no bucket holds the bulk

    # left joins are supported; right/full outer are rejected loudly (each
    # unmatched small-side row would surface once per salt copy)
    lgot = salted_join(large, small, "k", how="left")
    lwant = large.join(small, "k", "left")
    assert {tuple(r) for r in lgot.collect()} == {tuple(r) for r in lwant.collect()}
    import pytest as _pytest

    for bad in ("right", "full", "full_outer", "right_outer"):
        with _pytest.raises(ValueError, match="salted_join supports"):
            salted_join(large, small, "k", how=bad)
