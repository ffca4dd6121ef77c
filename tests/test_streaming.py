"""Incremental streaming extraction: AvailableNow drains available files;
re-run after new files decodes only the new ones; output equals batch."""

from chug_spark.config import ExtractJobCfg
from chug_spark.extract import extract_docread, flatten_spans
from chug_spark.schema import DOCUMENTS_SCHEMA
from chug_spark.streaming.stream import read_stream_output, run_stream_extract
from chug_spark.synth import make_doc


def _flat_set(df):
    return {
        (r["doc_id"], r["offset"], r["kind"], r["text"], r["media_ref"])
        for r in df.collect()
    }


def test_stream_incremental_equals_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    cfg = ExtractJobCfg(render_dpi=12)

    rows1 = [make_doc(i, seed=61) for i in range(30)]
    spark.createDataFrame(rows1, DOCUMENTS_SCHEMA).write.mode("append").parquet(in_dir)
    run_stream_extract(spark, in_dir, out_dir, cfg)
    first = _flat_set(read_stream_output(spark, out_dir))

    # new files arrive → second drain processes ONLY them (checkpointed)
    rows2 = [make_doc(i, seed=61) for i in range(30, 50)]
    spark.createDataFrame(rows2, DOCUMENTS_SCHEMA).write.mode("append").parquet(in_dir)
    run_stream_extract(spark, in_dir, out_dir, cfg)
    streamed = _flat_set(read_stream_output(spark, out_dir))
    assert len(streamed) > len(first)

    batch_docs = spark.createDataFrame(rows1 + rows2, DOCUMENTS_SCHEMA)
    spans_out, _ = extract_docread(spark, batch_docs, cfg)
    assert streamed == _flat_set(flatten_spans(spans_out))

    # idempotent: draining again with nothing new changes nothing
    run_stream_extract(spark, in_dir, out_dir, cfg)
    assert _flat_set(read_stream_output(spark, out_dir)) == streamed

    # at-least-once replay: a crash between the data write and the streaming
    # checkpoint commit re-delivers the batch with the SAME batch_id — the
    # partition-overwrite write must replace, not append duplicates.
    from chug_spark.streaming.stream import process_one_batch

    replay_df = spark.createDataFrame(rows2, DOCUMENTS_SCHEMA)
    process_one_batch(replay_df, 1, cfg, f"{out_dir}/spans", f"{out_dir}/errors")
    process_one_batch(replay_df, 1, cfg, f"{out_dir}/spans", f"{out_dir}/errors")
    replayed = read_stream_output(spark, out_dir)
    assert replayed.count() == len(streamed)  # no duplicate rows appended
    assert _flat_set(replayed) == streamed


def test_stateful_stream_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState first-seen dedup: a fingerprint emitted in an
    earlier drain is suppressed in later drains (state store, not driver
    memory); within a batch the min doc_id wins."""
    from chug_spark.streaming.stateful import read_dedup_output, run_stream_dedup

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")

    batch1 = [(3, "hello world"), (1, "HELLO   world"), (2, "other text")]
    spark.createDataFrame(batch1, "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(in_dir)
    run_stream_dedup(spark, in_dir, out_dir)
    got1 = {r["doc_id"]: r["fp"] for r in read_dedup_output(spark, out_dir).collect()}
    # 1 < 3 within the batch for the same normalized fingerprint
    assert set(got1) == {1, 2}

    # second drain: duplicate of batch1 content + one genuinely new doc
    batch2 = [(9, "hello world"), (8, "other text"), (7, "brand new")]
    spark.createDataFrame(batch2, "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(in_dir)
    run_stream_dedup(spark, in_dir, out_dir)
    got2 = {r["doc_id"] for r in read_dedup_output(spark, out_dir).collect()}
    assert got2 == {1, 2, 7}  # 9/8 suppressed by state


def test_stream_window_counts_match_batch(spark, tmp_path):
    """The streaming watermark+window aggregation emits exactly the batch
    tumbling windows, except trailing windows still inside the watermark
    (append mode finalizes a window only once the watermark passes it)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from chug_spark.streaming.windows import (
        read_window_output,
        run_stream_window_counts,
        tumbling_counts,
    )

    in_dir = str(tmp_path / "ev_in")
    out_dir = str(tmp_path / "ev_out")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, t0 + dt.timedelta(seconds=37 * i), i % 5,
         ["view", "click"][i % 2], float(i % 7) + 0.25)
        for i in range(400)
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    df = spark.createDataFrame(rows[:250], schema)
    df.write.mode("append").parquet(in_dir)
    run_stream_window_counts(spark, in_dir, out_dir)

    # late-arriving second file -> second drain continues from checkpoint
    spark.createDataFrame(rows[250:], schema).write.mode("append").parquet(in_dir)
    run_stream_window_counts(spark, in_dir, out_dir)

    got = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in read_window_output(spark, out_dir).collect()
    }
    batch = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in tumbling_counts(spark.createDataFrame(rows, schema)).collect()
    }
    assert got, "no windows emitted"
    # every emitted window matches the batch result exactly
    assert all(batch[k] == v for k, v in got.items())
    # everything missing is within the watermark horizon of the final batch
    max_ts = max(r[1] for r in rows)
    horizon = max_ts - dt.timedelta(minutes=10 + 5)
    missing = set(batch) - set(got)
    assert all(k[0] >= horizon for k in missing)


def test_stream_asof_matches_batch_across_drains(spark, tmp_path):
    """Streaming as-of: marks drained in batch 1 must annotate events
    arriving in batch 2 (state store carry), and the combined output over a
    time-ordered ingest equals the batch as-of join exactly."""
    import os

    from chug_spark.ops.events import asof_attach_last_mark
    from chug_spark.streaming.asof import read_asof_output, run_stream_asof

    from pyspark.sql import functions as F

    from chug_spark.ops.events import epoch_us as _eus

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    cutoff = events.agg(
        F.percentile(_eus("ts"), F.lit(0.5)).alias("c")
    ).collect()[0]["c"]
    # time-ordered two-drop ingest layout

    first = events.filter(_eus("ts") <= cutoff)
    second = events.filter(_eus("ts") > cutoff)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")

    first.repartition(2).write.mode("append").parquet(in_dir)
    run_stream_asof(spark, in_dir, out_dir)
    n_first = read_asof_output(spark, out_dir).count()

    second.repartition(2).write.mode("append").parquet(in_dir)
    run_stream_asof(spark, in_dir, out_dir)

    got = {
        r["event_id"]: (r["last_mark_id"], r["us_since_mark"])
        for r in read_asof_output(spark, out_dir).collect()
    }
    want = {
        r["event_id"]: (r["last_mark_id"], r["us_since_mark"])
        for r in asof_attach_last_mark(events).collect()
    }
    assert got == want and 0 < n_first < len(got)
    # the cross-batch proof: some second-drain event is annotated by a mark
    # whose id belongs to the first drain
    first_ids = {r["event_id"] for r in first.collect()}
    second_ids = {r["event_id"] for r in second.collect()}
    assert any(
        m is not None and m in first_ids and e in second_ids
        for e, (m, _) in got.items()
    )


def test_stream_window_late_data_dropped(spark, tmp_path):
    """Watermark semantics: a second drain carrying events OLDER than the
    advanced watermark must not reopen finalized windows — the late rows are
    dropped by the state store, so finalized window counts never change."""
    import datetime as dt
    import os

    from pyspark.sql import types as T

    from chug_spark.streaming.windows import run_stream_window_counts

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    base = dt.datetime(2024, 6, 1, 0, 0, 0)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")

    # drain 1: events at t+0..4min and t+60min (advances watermark past the
    # first window by far more than the 10-minute allowance)
    batch1 = [(i, base + dt.timedelta(minutes=i), 1, "view", 1.0) for i in range(5)]
    batch1.append((99, base + dt.timedelta(minutes=60), 1, "view", 1.0))
    spark.createDataFrame(batch1, schema).write.mode("append").parquet(in_dir)
    run_stream_window_counts(spark, in_dir, out_dir, minutes=5, watermark="10 minutes")
    first = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in spark.read.parquet(os.path.join(out_dir, "windows")).collect()
    }
    key0 = (base, "view")
    assert first[key0] == (5, 500)  # the finalized first window

    # drain 2: LATE events inside the long-finalized first window
    batch2 = [(200 + i, base + dt.timedelta(minutes=1), 1, "view", 7.0) for i in range(3)]
    spark.createDataFrame(batch2, schema).write.mode("append").parquet(in_dir)
    run_stream_window_counts(spark, in_dir, out_dir, minutes=5, watermark="10 minutes")
    second = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in spark.read.parquet(os.path.join(out_dir, "windows")).collect()
    }
    # the late rows neither re-emitted the window nor changed its counts
    assert second[key0] == (5, 500)
    assert sum(1 for (ws, _t) in second if ws == base) == 1


def test_stream_tar_ingest_incremental_drains(spark, tmp_path):
    """Two-drain shard ingestion: drain 1 ingests the first shards; new
    shards dropped afterwards are the ONLY thing drain 2 processes (file-
    source checkpoint); final samples equal the batch reader over all
    shards."""
    import os

    from chug_spark.sources.tar import read_tar_samples, write_tar_shards
    from chug_spark.streaming.stream import run_stream_tar_ingest

    shard_dir = str(tmp_path / "shards")
    out_dir = str(tmp_path / "out")
    os.makedirs(shard_dir)

    def mk(i):
        return (f"k{i}", [(f"k{i}.json", b'{"k": %d}' % i),
                          (f"k{i}.txt", f"text {i}".encode())])

    write_tar_shards([mk(0), mk(1)], shard_dir, n_shards=1)
    os.rename(shard_dir + "/shard-00000.tar", shard_dir + "/a.tar")
    run_stream_tar_ingest(spark, shard_dir + "/*.tar", out_dir)
    first = spark.read.parquet(out_dir + "/samples")
    assert sorted(r.doc_id for r in first.collect()) == ["k0", "k1"]

    write_tar_shards([mk(2), mk(3)], shard_dir, n_shards=1)
    os.rename(shard_dir + "/shard-00000.tar", shard_dir + "/b.tar")
    run_stream_tar_ingest(spark, shard_dir + "/*.tar", out_dir)
    out = spark.read.parquet(out_dir + "/samples")
    got = {r.doc_id: r for r in out.collect()}
    assert sorted(got) == ["k0", "k1", "k2", "k3"]
    # drain 2 only processed the new shard (different batch partition)
    b0 = {r.doc_id for r in out.filter("batch_id = 0").collect()}
    assert b0 == {"k0", "k1"}

    # value parity with the batch reader
    batch = read_tar_samples(spark, shard_dir + "/*.tar").collect()
    bm = {r.doc_id: r.spans for r in batch}
    for k, r in got.items():
        assert [tuple(s) for s in r.spans] == [tuple(s) for s in bm[k]]


def test_stream_html_ingest_incremental(spark, tmp_path):
    """Two-drain web-crawl ingestion: drain 2 converts only the new pages
    file; output samples match the html:// batch source value-for-value."""
    import os

    from chug_spark.sources.registry import read_source
    from chug_spark.streaming.stream import run_stream_html_ingest

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    os.makedirs(pages_dir)

    def page(i):
        return (f"p{i}", f"<p>page {i} body text long enough to keep it</p>"
                         f"<img src='m/{i}.png'>")

    def write_pages(rows, name):
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pa.table({"doc_id": [r[0] for r in rows],
                        "html": [r[1] for r in rows]})
        pq.write_table(tbl, os.path.join(pages_dir, name))

    write_pages([page(0), page(1)], "a.parquet")
    run_stream_html_ingest(spark, pages_dir, out_dir)
    first = spark.read.parquet(out_dir + "/samples")
    assert sorted(r.doc_id for r in first.collect()) == ["p0", "p1"]

    write_pages([page(2)], "b.parquet")
    run_stream_html_ingest(spark, pages_dir, out_dir)
    out = spark.read.parquet(out_dir + "/samples")
    got = {r.doc_id: r for r in out.collect()}
    assert sorted(got) == ["p0", "p1", "p2"]
    assert {r.doc_id for r in out.filter("batch_id = 0").collect()} == {"p0", "p1"}

    batch = {r.doc_id: r.spans
             for r in read_source(spark, f"html://{pages_dir}").collect()}
    for k, r in got.items():
        assert [tuple(s) for s in r.spans] == [tuple(s) for s in batch[k]]
