"""Stateful streaming keep-first dedup: applyInPandasWithState semantics,
state persistence across a second drain, and batch parity."""

import pytest
from pyspark.sql import functions as F

from chug_spark.streaming.stateful import read_dedup_output, run_stream_dedup

SCHEMA = "doc_id long, text string"


def _write(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_stream_dedup_within_and_across_batches(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")

    # batch 0: one in-batch duplicate pair (2 wins over 7), one NULL and one
    # empty text (same fingerprint '', 10 wins over 11)
    _write(spark, [
        (1, "alpha beta"),
        (2, "gamma delta"),
        (7, "gamma  DELTA "),   # normalizes to the same line as 2
        (10, None),
        (11, ""),
    ], in_dir)
    run_stream_dedup(spark, in_dir, out_dir)
    first = {r["doc_id"] for r in read_dedup_output(spark, out_dir).collect()}
    assert first == {1, 2, 10}

    # batch 1 (same checkpoint): re-sends of seen fingerprints must emit
    # nothing; a brand-new text must emit
    _write(spark, [
        (20, "alpha beta"),     # dup of 1, suppressed by carried state
        (21, "gamma delta"),    # dup of 2
        (22, None),             # dup of fp ''
        (23, "totally new"),
    ], in_dir)
    run_stream_dedup(spark, in_dir, out_dir)
    both = {r["doc_id"] for r in read_dedup_output(spark, out_dir).collect()}
    assert both == {1, 2, 10, 23}


def test_stream_dedup_equals_batch_min(spark, tmp_path):
    """On a corpus where every cross-batch duplicate has a larger doc_id
    than its first-batch original, streaming keep-first == batch min-doc_id
    dedup over the union."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")

    b0 = [(i, f"text number {i % 6}") for i in range(12)]
    _write(spark, b0, in_dir)
    run_stream_dedup(spark, in_dir, out_dir)
    b1 = [(100 + i, f"text number {i % 6}") for i in range(12)] + [
        (200, "late arrival unique")
    ]
    _write(spark, b1, in_dir)
    run_stream_dedup(spark, in_dir, out_dir)

    got = {
        (r["doc_id"], r["fp"])
        for r in read_dedup_output(spark, out_dir).collect()
    }
    union = spark.createDataFrame(b0 + b1, SCHEMA)
    from chug_spark.ops.dedup import normalize_text

    fp = F.md5(F.coalesce(normalize_text(F.col("text")), F.lit("")))
    ref = {
        (r["doc_id"], r["fp"])
        for r in union.select("doc_id", fp.alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "fp")
        .collect()
    }
    assert got == ref
    assert len(got) == 7  # 6 distinct texts + the late unique
