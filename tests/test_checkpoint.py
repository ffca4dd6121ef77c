"""Checkpointed bucket-wise run + resume: kill after k buckets, rerun, final
output equals a single clean run; no duplicate spans (SURVEY.md §5.4)."""

import pytest

from pyspark.sql import functions as F

from chug_spark.checkpoint import read_checkpoint, read_output, write_with_checkpoint
from chug_spark.config import ExtractJobCfg
from chug_spark.extract import extract_docread, flatten_spans
from chug_spark.schema import DOCUMENTS_SCHEMA
from chug_spark.synth import make_doc


def _corpus(spark, n=80):
    return spark.createDataFrame([make_doc(i, seed=31) for i in range(n)], DOCUMENTS_SCHEMA)


def _flat_set(df):
    return {
        (r["doc_id"], r["offset"], r["kind"], r["text"], r["media_ref"])
        for r in df.collect()
    }


def test_resume_after_simulated_crash(spark, tmp_path):
    docs = _corpus(spark)
    cfg = ExtractJobCfg(render_dpi=12, run_id="runA")
    out_dir = str(tmp_path / "out")

    with pytest.raises(RuntimeError, match="simulated failure"):
        write_with_checkpoint(spark, docs, cfg, out_dir, n_buckets=6, fail_after=2)
    cp = read_checkpoint(spark, out_dir, "runA")
    assert cp.filter(F.col("status") == "done").count() == 2

    # resume: remaining 4 buckets only
    write_with_checkpoint(spark, docs, cfg, out_dir, n_buckets=6)
    cp = read_checkpoint(spark, out_dir, "runA")
    assert cp.filter(F.col("status") == "done").count() == 6
    assert cp.agg(F.max("attempt")).collect()[0][0] == 2  # second attempt recorded

    resumed = _flat_set(read_output(spark, out_dir))

    # reference: single clean run
    spans_out, _ = extract_docread(spark, docs, cfg)
    clean = _flat_set(flatten_spans(spans_out))
    assert resumed == clean

    # idempotent: a third invocation is a no-op and changes nothing
    write_with_checkpoint(spark, docs, cfg, out_dir, n_buckets=6)
    assert _flat_set(read_output(spark, out_dir)) == clean


def test_staged_input_partition_prunes(spark, tmp_path):
    """The per-bucket read must scan only its own staged partition: the
    physical plan carries the bucket predicate as a PartitionFilter (100 TB
    contract: 2x total input read, not n_buckets full scans).  The staged
    copy survives a crash (resume reuses it) and is deleted once every
    bucket is done."""
    import os

    docs = _corpus(spark, n=30)
    cfg = ExtractJobCfg(render_dpi=12, run_id="runC")
    out_dir = str(tmp_path / "outC")
    try:
        write_with_checkpoint(spark, docs, cfg, out_dir, n_buckets=4, fail_after=2)
    except RuntimeError:
        pass

    # crashed mid-run: staged copy still there, partition-pruned per bucket
    staged = spark.read.parquet(f"{out_dir}/staged_runC")
    plan = (
        staged.filter(F.col("bucket") == 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters")[1][:120]

    # resume to completion → staged full-corpus copy is cleaned up
    write_with_checkpoint(spark, docs, cfg, out_dir, n_buckets=4)
    assert not os.path.exists(f"{out_dir}/staged_runC")

    # error-bucket accounting comes from the written partitions
    cp = read_checkpoint(spark, out_dir, "runC")
    total_err = sum(r["error_count"] for r in cp.collect())
    err = spark.read.parquet(f"{out_dir}/errors")
    assert total_err == err.count()


def test_checkpoint_lineage_metrics(spark, tmp_path):
    docs = _corpus(spark, n=40)
    cfg = ExtractJobCfg(render_dpi=12, run_id="runB")
    out_dir = str(tmp_path / "outB")
    write_with_checkpoint(spark, docs, cfg, out_dir, n_buckets=3)
    cp = read_checkpoint(spark, out_dir, "runB")
    rows = cp.collect()
    assert len(rows) == 3
    total_spans = sum(r["span_count"] for r in rows)
    assert total_spans == read_output(spark, out_dir).count()
    assert all(r["wall_ms"] >= 0 and r["status"] == "done" for r in rows)

def test_single_pass_mode_equals_serial(spark, tmp_path):
    """Single-pass mode: all unfinished buckets in ONE extraction with
    dynamic-partition writes; output and lineage metrics equal the serial
    mode's; resume after a serial-mode crash works in single-pass."""
    docs = _corpus(spark, n=60)
    out_serial = str(tmp_path / "serial")
    out_single = str(tmp_path / "single")

    cfg_s = ExtractJobCfg(render_dpi=12, run_id="runS")
    write_with_checkpoint(spark, docs, cfg_s, out_serial, n_buckets=5)

    cfg_1 = ExtractJobCfg(render_dpi=12, run_id="runP")
    write_with_checkpoint(spark, docs, cfg_1, out_single, n_buckets=5, single_pass=True)

    assert _flat_set(read_output(spark, out_single)) == _flat_set(
        read_output(spark, out_serial)
    )

    # per-bucket lineage identical (wall_ms/attempt aside)
    key = lambda cp: {
        r["bucket"]: (r["doc_count"], r["span_count"], r["error_count"], r["status"])
        for r in cp.collect()
    }
    cp_s = key(read_checkpoint(spark, out_serial, "runS"))
    cp_1 = key(read_checkpoint(spark, out_single, "runP"))
    assert cp_s == cp_1 and len(cp_1) == 5

    # idempotent no-op second invocation
    write_with_checkpoint(spark, docs, cfg_1, out_single, n_buckets=5, single_pass=True)
    assert _flat_set(read_output(spark, out_single)) == _flat_set(
        read_output(spark, out_serial)
    )

    # staged copy cleaned up after the clean single-pass run
    import os

    assert not os.path.exists(f"{out_single}/staged_runP")


def test_single_pass_resumes_serial_crash(spark, tmp_path):
    docs = _corpus(spark, n=60)
    cfg = ExtractJobCfg(render_dpi=12, run_id="runQ")
    out_dir = str(tmp_path / "outQ")
    with pytest.raises(RuntimeError, match="simulated failure"):
        write_with_checkpoint(spark, docs, cfg, out_dir, n_buckets=5, fail_after=2)

    # finish the remaining 3 buckets in one pass
    write_with_checkpoint(spark, docs, cfg, out_dir, n_buckets=5, single_pass=True)
    cp = read_checkpoint(spark, out_dir, "runQ")
    assert cp.filter(F.col("status") == "done").count() == 5

    spans_out, _ = extract_docread(spark, docs, cfg)
    assert _flat_set(read_output(spark, out_dir)) == _flat_set(flatten_spans(spans_out))

    # fail_after is a serial-mode concept
    with pytest.raises(ValueError, match="serial-mode"):
        write_with_checkpoint(
            spark, docs, cfg, out_dir, n_buckets=5, single_pass=True, fail_after=1
        )


def test_md5_bucket_engine_equals_default_and_no_conf_leak(spark, tmp_path):
    """bucket_engine='md5' (the portable-oracle path) produces the same final
    table as the xxhash64 default, only bucketed differently; and the job
    must not leak partitionOverwriteMode into the session conf (it is scoped
    per-writer)."""
    from chug_spark.checkpoint import bucket_col

    before = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")

    docs = _corpus(spark, n=50)
    cfg = ExtractJobCfg(render_dpi=12, run_id="runM")
    out_md5, out_xx = str(tmp_path / "m"), str(tmp_path / "x")
    write_with_checkpoint(spark, docs, cfg, out_md5, n_buckets=4,
                          single_pass=True, bucket_engine="md5")
    write_with_checkpoint(spark, docs, cfg, out_xx, n_buckets=4,
                          single_pass=True)
    assert _flat_set(read_output(spark, out_md5)) == _flat_set(
        read_output(spark, out_xx)
    )

    # md5 bucket assignment is in range and deterministic
    b = docs.select(bucket_col(0, 4, "md5").alias("b")).distinct().collect()
    assert {r["b"] for r in b} <= set(range(4))

    after = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    assert after == before

    with pytest.raises(ValueError, match="engine"):
        docs.select(bucket_col(0, 4, "crc32"))
