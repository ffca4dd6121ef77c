"""WARC shard ingestion (sources/warc.py): Content-Length framing, record
typing, gzip shards, truncation policy, and the fixture round trip."""

import gzip

import pytest

from chug_spark.sources.warc import (
    _record,
    build_warc_fixture,
    parse_warc_stream,
    read_warc_records,
)


def _resp(url: str, body: bytes, status: bytes = b"200 OK") -> bytes:
    http = b"HTTP/1.1 " + status + b"\r\nContent-Type: text/html\r\n\r\n" + body
    return _record(
        [("WARC-Type", "response"), ("WARC-Target-URI", url),
         ("WARC-Date", "2020-01-01T00:00:00Z"),
         ("Content-Type", "application/http; msgtype=response")],
        http,
    )


def test_framing_ignores_embedded_magic():
    # payload contains a line that LOOKS like a record start; Content-Length
    # framing must carry the parser straight over it
    body = b"<p>before</p>\r\nWARC/1.0\r\nWARC-Type: fake\r\n<p>after</p>"
    blob = _resp("https://a/1", body) + _resp("https://a/2", b"<p>x</p>")
    df = parse_warc_stream("s", blob)
    assert list(df["rec_no"]) == [0, 1]
    assert list(df["url"]) == ["https://a/1", "https://a/2"]
    assert "before" in df["body"][0] and "after" in df["body"][0]


def test_non_response_records_carry_null_http_fields():
    blob = (
        _record([("WARC-Type", "warcinfo")], b"software: x\r\n")
        + _resp("https://a/1", b"<p>hi</p>")
        + _record([("WARC-Type", "request"), ("WARC-Target-URI", "https://a/1")],
                  b"GET / HTTP/1.1\r\n")
    )
    df = parse_warc_stream("s", blob)
    assert list(df["warc_type"]) == ["warcinfo", "response", "request"]
    import pandas as pd

    assert pd.isna(df["http_status"][0]) and df["body"][0] is None
    assert df["http_status"][1] == 200
    assert df["body"][2] is None  # request payload is not an HTTP response


def test_truncated_record_is_data_not_exception():
    good = _resp("https://a/1", b"<p>ok</p>")
    trunc = _record(
        [("WARC-Type", "response"), ("WARC-Target-URI", "https://a/2")],
        b"HTTP/1.1 200 OK\r\n\r\nfull body",
    )[:-12]  # cut mid-payload: declared Content-Length overruns the bytes
    df = parse_warc_stream("s", good + trunc)
    assert list(df["warc_type"]) == ["response", "__truncated__"]
    assert df["url"][1] == "https://a/2"  # headers still surfaced


def test_negative_content_length_terminates():
    """A negative Content-Length must stop the shard as __truncated__ —
    never move the cursor backwards (infinite loop / unbounded rows)."""
    good = _resp("https://a/1", b"<p>ok</p>")
    evil = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: -29\r\n\r\n"
    df = parse_warc_stream("s", good + evil)
    assert list(df["warc_type"]) == ["response", "__truncated__"]


def test_corrupt_gzip_is_data_not_exception():
    raw = _resp("https://a/1", b"<p>ok</p>")
    df = parse_warc_stream("s", gzip.compress(raw)[:-5])  # truncated transfer
    assert list(df["warc_type"]) == ["__truncated__"]


def test_gzip_stream_roundtrip():
    raw = _resp("https://a/1", b"<p>one</p>") + _resp("https://a/2", b"<p>two</p>")
    df = parse_warc_stream("s", gzip.compress(raw))
    assert list(df["url"]) == ["https://a/1", "https://a/2"]


def test_http_status_and_content_type_parse():
    blob = _resp("https://a/1", b"gone", status=b"404 Not Found")
    df = parse_warc_stream("s", blob)
    assert df["http_status"][0] == 404
    assert df["body"][0] == "gone"


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.binary(min_size=0, max_size=120).map(
                # adversarial payloads: splice record-magic lines into the
                # middle so only Content-Length framing can survive
                lambda b: b[: len(b) // 2] + b"\r\nWARC/1.0\r\n" + b[len(b) // 2 :]
            ),
            min_size=1,
            max_size=8,
        ),
        st.booleans(),
    )
    def test_framing_roundtrip_property(payloads, gz):
        blob = b"".join(
            _record(
                [("WARC-Type", "resource"), ("WARC-Target-URI", f"u://{i}")],
                p,
            )
            for i, p in enumerate(payloads)
        )
        if gz:
            blob = gzip.compress(blob)
        df = parse_warc_stream("s", blob)
        assert list(df["rec_no"]) == list(range(len(payloads)))
        assert list(df["url"]) == [f"u://{i}" for i in range(len(payloads))]
        assert "__truncated__" not in set(df["warc_type"])

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


SF_DIR = "/root/testdata/sf0.001"


def test_stream_warc_ingest_incremental(spark, tmp_path):
    """Second drain parses ONLY the shards that arrived after the first
    (file-source checkpoint), and the combined output equals the batch
    read of all shards."""
    import os
    import shutil

    from chug_spark.streaming.stream import (
        read_warc_stream_output,
        run_stream_warc_ingest,
    )

    corpus = build_warc_fixture(spark, SF_DIR)
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(in_dir)
    shards = sorted(f for f in os.listdir(corpus) if ".warc" in f)
    for f in shards[:2]:
        shutil.copy(os.path.join(corpus, f), in_dir)
    run_stream_warc_ingest(spark, in_dir, out_dir)
    n1 = read_warc_stream_output(spark, out_dir).count()

    for f in shards[2:]:
        shutil.copy(os.path.join(corpus, f), in_dir)
    run_stream_warc_ingest(spark, in_dir, out_dir)
    streamed = read_warc_stream_output(spark, out_dir)

    batch = read_warc_records(spark, corpus + "/*.warc*")
    assert streamed.count() == batch.count() > n1 > 0
    # per-shard record sets identical to the batch parse (shard paths
    # differ by directory; compare basename + rec_no + url)
    from pyspark.sql import functions as F

    def keyset(df):
        return {
            (r["s"], r["rec_no"], r["url"])
            for r in df.select(
                F.regexp_extract("shard", r"([^/]+)$", 1).alias("s"),
                "rec_no", "url",
            ).collect()
        }

    assert keyset(streamed) == keyset(batch)


def test_fixture_reader_end_to_end(spark):
    sf_dir = SF_DIR
    corpus = build_warc_fixture(spark, sf_dir)
    recs = read_warc_records(spark, corpus + "/*.warc*").cache()
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n_docs = docs.count()
        by_type = dict(
            recs.groupBy("warc_type").count().collect()
        )
        assert by_type["warcinfo"] == 4  # one per shard
        assert by_type["response"] == n_docs
        assert by_type.get("__truncated__", 0) == 0
        n_req = docs.filter("doc_id % 5 = 0").count()
        assert by_type.get("request", 0) == n_req
        # every response URL round-trips its doc_id
        from pyspark.sql import functions as F

        ids = (
            recs.filter("warc_type = 'response'")
            .select(F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long").alias("i"))
        )
        assert ids.distinct().count() == n_docs
    finally:
        recs.unpersist()


def test_write_spans_caps_records_per_file(spark, tmp_path):
    """maxRecordsPerFile bounds output file size without a count pre-pass
    (the giant-file half of 100 TB write hygiene; AQE handles small files)."""
    import glob

    from chug_spark.sources.documents import write_spans

    df = spark.range(100).selectExpr("id AS doc_id", "'x' AS text").coalesce(1)
    out = str(tmp_path / "capped")
    write_spans(df, out, max_records_per_file=10)
    files = glob.glob(out + "/*.parquet")
    assert len(files) >= 10
    assert spark.read.parquet(out).count() == 100


def test_keep_bytes_round_trips_raw_body(spark):
    """keep_bytes=True surfaces the UNdecoded HTTP body (charset-sniff
    input): non-UTF-8 bytes must arrive exactly, while `body` stays the
    legacy replace-decode; without the flag the schema is unchanged."""
    from chug_spark.sources.warc import parse_warc_stream, _record

    body = b"caf\xe9 latin"
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    blob = _record(
        [("WARC-Type", "response"),
         ("WARC-Target-URI", "https://x/doc/1"),
         ("WARC-Date", "2020-01-01T00:00:00Z")],
        http,
    )
    pdf = parse_warc_stream("s", blob, keep_bytes=True)
    assert list(pdf.columns)[-1] == "body_bytes"
    assert bytes(pdf["body_bytes"][0]) == body
    assert pdf["body"][0] == body.decode("utf-8", "replace")  # U+FFFD
    assert "body_bytes" not in parse_warc_stream("s", blob).columns
