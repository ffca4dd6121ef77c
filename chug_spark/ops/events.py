"""Event-stream operators: gap sessionization and as-of join.

Not in the reference (chug is a training-data loader); these are the two
event-table operators every large-scale pipeline ends up needing next to the
extraction job, built Spark-first:

- :func:`sessionize` — classic gap-based sessions (new session when the gap
  to the previous event of the same user exceeds the threshold) as pure
  window expressions: lag → boundary flag → running sum.  One shuffle on
  user_id, sort within partition; no state kept beyond the window frame, so
  it scales to any event count per the usual skewed-user caveat (a single
  user with billions of events serializes in one task — cap upstream).
- :func:`asof_attach_last_mark` — as-of join (each event annotated with the
  most recent "mark" event at or before it).  Spark has no ASOF JOIN; the
  scalable formulation is the union trick: tag marks and events, sort both
  on (time, is_event) within user, and take the last non-null mark struct
  over an unbounded-preceding frame.  ONE shuffle on user_id — never a
  range join (O(n·m) explosion) nor a per-key collect.

All time math in integer microseconds (:func:`epoch_us` / DuckDB
``epoch_us``), so results are bit-identical across engines and timezones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_us(col: str = "ts") -> Column:
    """Microseconds since epoch for a TIMESTAMP_NTZ column — wall-clock
    arithmetic with no timezone interpretation on either engine (DuckDB
    twin: ``epoch_us(ts)``).  ``unix_micros`` rejects NTZ inputs, and an
    NTZ→TIMESTAMP cast would smuggle the session timezone into the value."""
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {col})"
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_no, start_us, end_us, n_events, value_cents):
    sessions split where the gap to the user's previous event reaches
    ``gap_minutes`` (>= gap starts a new session — the same half-open
    interval semantics as Spark's built-in ``session_window``, locked by a
    cross-check test).  session_no is 1-based per user in time order —
    deterministic across engines (ties broken by event_id)."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    # An event without a timestamp cannot be placed in any session; exclude
    # it explicitly (Spark would otherwise sort NULLs first while other
    # engines sort them last — cross-engine session numbering would differ).
    e = events.filter(F.col("ts").isNotNull()).select(
        "user_id",
        "event_id",
        epoch_us("ts").alias("tus"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    prev = F.lag("tus").over(w)
    new_s = F.when(prev.isNull() | ((F.col("tus") - prev) >= gap_us), 1).otherwise(0)
    sess = e.withColumn(
        "session_no",
        F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.min("tus").alias("start_us"),
        F.max("tus").alias("end_us"),
        F.count(F.lit(1)).cast("int").alias("n_events"),
        F.sum("cents").alias("value_cents"),
    )


def asof_attach_last_mark(events: DataFrame, mark_type: str = "error") -> DataFrame:
    """(event_id, user_id, last_mark_id, us_since_mark): each event annotated
    with the most recent event of ``mark_type`` for the same user at or
    before its timestamp (inclusive: a mark event matches itself).  NULLs for
    events before the user's first mark.  Marks sharing a (user, timestamp)
    are deduplicated to the max event_id so tie semantics are explicit."""
    # NULL-timestamp events have no position on the as-of axis: exclude them
    # (same rationale as sessionize — engines disagree on NULL sort order).
    e = events.filter(F.col("ts").isNotNull()).select(
        "user_id", "event_id", epoch_us("ts").alias("tus"), "event_type"
    )
    marks = (
        e.filter(F.col("event_type") == mark_type)
        .groupBy("user_id", "tus")
        .agg(F.max("event_id").alias("mark_id"))
    )
    tagged = e.select(
        "user_id",
        "tus",
        F.lit(1).alias("is_event"),
        "event_id",
        F.lit(None).cast("struct<tus:long,mark_id:long>").alias("m"),
    ).unionByName(
        marks.select(
            "user_id",
            "tus",
            F.lit(0).alias("is_event"),
            F.lit(None).cast("long").alias("event_id"),
            F.struct(F.col("tus"), F.col("mark_id")).alias("m"),
        )
    )
    # marks sort before events at equal time (is_event 0 < 1), so a mark is
    # visible to same-timestamp events; event rows carry null m and cannot
    # perturb last(ignorenulls) regardless of their tie order
    w = (
        Window.partitionBy("user_id")
        .orderBy("tus", "is_event", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attached = tagged.withColumn("lm", F.last("m", ignorenulls=True).over(w))
    return attached.filter(F.col("is_event") == 1).select(
        "event_id",
        "user_id",
        F.col("lm.mark_id").alias("last_mark_id"),
        (F.col("tus") - F.col("lm.tus")).alias("us_since_mark"),
    )


def sessionize_presplit(
    events: DataFrame, gap_minutes: int = 30, split_hours: int = 24
) -> DataFrame:
    """Skew-safe :func:`sessionize`: identical output, hot users parallelized.

    Plain sessionize sorts ALL of a user's events in one task — a bot with
    10^9 events serializes the stage.  This variant:

    1. chunks the timeline into ``split_hours`` buckets and runs the same
       lag-cumsum session pass partitioned by (user_id, chunk) — a hot
       user's work now spreads over #chunks tasks;
    2. merges adjacent chunk-local sessions per user where the boundary gap
       is < gap (one more window, but over SESSION rows — orders of
       magnitude fewer than events for any user hot enough to matter).

    Chunk-internal session boundaries are true global boundaries (a gap
    >= threshold inside a chunk is >= threshold globally), and every chunk
    boundary is re-examined in the merge, so the result equals plain
    sessionize row-for-row (equality locked by tests and by sharing the
    same DuckDB oracle in the driver contract).  Residual caveat: a user
    whose sessions are mostly singletons still funnels #sessions rows into
    one merge task; pick split_hours so chunks >> gap and sessions per
    chunk stay small.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    chunk_us = split_hours * 3600 * 1_000_000
    # same NULL-timestamp exclusion as plain sessionize (shared oracle)
    e = events.filter(F.col("ts").isNotNull()).select(
        "user_id",
        "event_id",
        epoch_us("ts").alias("tus"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).withColumn("chunk", (F.col("tus") / chunk_us).cast("long"))

    w1 = Window.partitionBy("user_id", "chunk").orderBy("tus", "event_id")
    prev = F.lag("tus").over(w1)
    new_local = F.when(prev.isNull() | ((F.col("tus") - prev) >= gap_us), 1).otherwise(0)
    local = (
        e.withColumn(
            "lsn",
            F.sum(new_local).over(
                w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "chunk", "lsn")
        .agg(
            F.min("tus").alias("start_us"),
            F.max("tus").alias("end_us"),
            F.count(F.lit(1)).cast("int").alias("n_events"),
            F.sum("cents").alias("value_cents"),
        )
    )

    # phase 2: merge chunk-local sessions whose boundary gap is < gap
    w2 = Window.partitionBy("user_id").orderBy("start_us", "end_us")
    prev_end = F.lag("end_us").over(w2)
    new_merged = F.when(
        prev_end.isNull() | ((F.col("start_us") - prev_end) >= gap_us), 1
    ).otherwise(0)
    merged = local.withColumn(
        "session_no",
        F.sum(new_merged).over(
            w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return merged.groupBy("user_id", "session_no").agg(
        F.min("start_us").alias("start_us"),
        F.max("end_us").alias("end_us"),
        F.sum("n_events").cast("int").alias("n_events"),
        F.sum("value_cents").alias("value_cents"),
    )
