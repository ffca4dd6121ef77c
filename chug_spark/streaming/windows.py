"""Event-time windowed aggregation — the watermark + tumbling-window op of
Structured Streaming (§2.11), expressed once and run both ways:

- :func:`tumbling_counts` — the batch form over any (ts, event_type, value)
  DataFrame: ``F.window`` tumbling buckets, count + exact value sum.  Used
  by the driver query ``events_window`` and oracle-checked against DuckDB
  ``time_bucket``.
- :func:`run_stream_window_counts` — the SAME aggregation as a streaming
  query: file stream → ``withWatermark`` → window groupBy → append sink with
  ``Trigger.AvailableNow``.  Late rows beyond the watermark are dropped by
  the state store; at-least-once replays of a finalized window are
  idempotent because append mode only emits a window once its watermark
  passes.

Value sums use integer cents (``round(value*100) :: long``) so the
aggregation is order-independent and bit-identical across engines and
parallelism levels — double sums are neither.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WINDOW_MINUTES = 5


def tumbling_counts(events: DataFrame, minutes: int = WINDOW_MINUTES) -> DataFrame:
    """Per (tumbling window, event_type): row count and exact value sum in
    cents.  One hash aggregation; partial aggregation makes the shuffle
    carry one row per (window, type) per task at any scale."""
    win = F.window(F.col("ts"), f"{minutes} minutes")
    cents = F.round(F.col("value") * 100).cast("long")
    # F.window silently drops NULL event-times; filter explicitly so the
    # contract (and the DuckDB oracle, which would otherwise keep a NULL
    # bucket) states the semantics rather than inheriting them.
    return (
        events.filter(F.col("ts").isNotNull())
        .select(win.alias("w"), F.col("event_type"), cents.alias("cents"))
        .groupBy("w", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            F.col("n_events").cast("int").alias("n_events"),
            F.col("value_cents").cast("long").alias("value_cents"),
        )
    )


def run_stream_window_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    minutes: int = WINDOW_MINUTES,
    watermark: str = "10 minutes",
) -> None:
    """Streaming twin of :func:`tumbling_counts` over a parquet file stream
    with schema (event_id long, ts timestamp, event_type string,
    value double)."""
    out_path = os.path.join(output_dir, "windows")
    ckpt = os.path.join(output_dir, "_checkpoint")
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        .parquet(input_dir)
        .withWatermark("ts", watermark)
    )
    agg = tumbling_counts(stream, minutes)
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_window_output(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(output_dir, "windows"))


def sliding_counts(
    events: DataFrame, width_minutes: int = 10, hop_minutes: int = 5
) -> DataFrame:
    """Per (sliding window, event_type) count + exact cents sum.  An event
    belongs to width/hop overlapping windows; Spark's ``F.window`` with a
    slide duration plans this as a generate (one row per covering window)
    followed by the same partial-agg shuffle as the tumbling case — output
    volume is (width/hop)× the input before the combine, which is the known
    cost of hopping windows at any scale.  Works over a batch DataFrame or
    a watermarked stream unchanged."""
    assert width_minutes % hop_minutes == 0, "width must be a multiple of hop"
    win = F.window(F.col("ts"), f"{width_minutes} minutes", f"{hop_minutes} minutes")
    cents = F.round(F.col("value") * 100).cast("long")
    # explicit NULL event-time exclusion (see tumbling_counts)
    return (
        events.filter(F.col("ts").isNotNull())
        .select(win.alias("w"), F.col("event_type"), cents.alias("cents"))
        .groupBy("w", "event_type")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_events"),
            F.sum("cents").alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


def session_counts(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per (user, session) aggregate via Spark's built-in
    ``F.session_window`` (merging-interval state) — the same sessions as the
    batch lag-cumsum formulation in :func:`chug_spark.ops.events.sessionize`
    minus the session numbering (session identity here is its start time).
    Works over a batch DataFrame or a watermarked stream unchanged.

    One caveat locked by tests: ``session_window``'s window END extends gap
    past the last event (close time), while ``sessionize`` reports the last
    EVENT time — compare on start + n_events + cents."""
    win = F.session_window(F.col("ts"), f"{gap_minutes} minutes")
    cents = F.round(F.col("value") * 100).cast("long")
    # explicit NULL event-time exclusion (see tumbling_counts)
    return (
        events.filter(F.col("ts").isNotNull())
        .select("user_id", win.alias("w"), F.col("ts"), cents.alias("cents"))
        .groupBy("user_id", "w")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_events"),
            F.sum("cents").alias("value_cents"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "value_cents",
        )
    )


def run_stream_session_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    gap_minutes: int = 30,
    watermark: str = "60 minutes",
) -> None:
    """Streaming sessionization: file stream → watermark → session_window
    groupBy → append sink (a session is emitted once the watermark passes its
    close time, so replays are idempotent)."""
    out_path = os.path.join(output_dir, "sessions")
    ckpt = os.path.join(output_dir, "_session_checkpoint")
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        .parquet(input_dir)
        .withWatermark("ts", watermark)
    )
    q = (
        session_counts(stream, gap_minutes)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
