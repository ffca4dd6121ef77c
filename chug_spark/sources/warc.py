"""WARC (Web ARChive) shard ingestion: the web-scale counterpart of the
reference's wds tar shards (ref src/chug/wds/tariterators.py:28-59 reads tar
member streams; Common-Crawl-style corpora ship the same "one shard file =
one sequential record stream" contract as WARC/1.0).

The reader mirrors the tar path's architecture exactly (sources/tar.py):
Spark ``binaryFile`` gives one row per ``.warc``/``.warc.gz`` shard, and a
``mapInPandas`` generator walks the record stream — **Content-Length-framed**
(ISO 28500 §4): record boundaries come from the declared payload length,
never from scanning for the ``WARC/1.0`` magic, so payloads containing the
literal magic parse correctly.

Semantics:

- every record is surfaced with its per-shard ``rec_no`` (position in the
  stream, counting warcinfo/request/... records too — framing evidence);
- ``response`` records additionally get the HTTP status line + headers
  parsed off the payload (``http_status``, ``content_type``) and the body
  decoded as UTF-8 text;
- a record whose declared Content-Length overruns the remaining bytes is
  emitted as ``warc_type='__truncated__'`` and the shard's stream stops
  there (the error is data, not an exception — same whole-file-never-dies
  policy as the decode path's ``__error__`` spans);
- ``.warc.gz`` shards are decompressed up front (multi-member gzip streams,
  the per-record-gzip layout Common Crawl uses, decode transparently).

Scale notes (100 TB): parallelism = number of shard files, zero shuffles
from WARC bytes to record rows; each task holds ONE shard's bytes
(binaryFile caps at 2 GB — re-shard above that, same note as tar.py).
Downstream main-content extraction (ops/html.html_to_spans, ops/dom) is
map-only, so WARC → spans is a single scan-stage pipeline.
"""

from __future__ import annotations

import gzip
import os
from collections.abc import Iterator
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

RECORD_SCHEMA = (
    "shard string, rec_no int, warc_type string, url string, "
    "warc_date string, http_status int, content_type string, body string"
)

#: with ``keep_bytes=True``: the raw HTTP body bytes ride along so the
#: charset sniffer (ops/charset.py) can run on the UNdecoded payload —
#: ``body`` stays the legacy UTF-8-replace decode
RECORD_SCHEMA_BYTES = RECORD_SCHEMA + ", body_bytes binary"

_COLS = ["shard", "rec_no", "warc_type", "url", "warc_date",
         "http_status", "content_type", "body", "body_bytes"]

_CRLF2 = b"\r\n\r\n"


def parse_warc_stream(
    shard: str, blob: bytes, keep_bytes: bool = False
) -> pd.DataFrame:
    """One WARC stream → RECORD_SCHEMA rows (+ ``body_bytes`` when
    ``keep_bytes``).  Content-Length framing; gzip (possibly multi-member)
    auto-detected."""
    rows: list[tuple] = []
    if blob[:2] == b"\x1f\x8b":
        try:
            blob = gzip.decompress(blob)
        except (EOFError, gzip.BadGzipFile, OSError):
            # shard truncated mid-transfer / corrupt: error is data, never
            # an exception (one bad shard must not kill the job)
            blob = b""
            rows.append((shard, 0, "__truncated__",
                         None, None, None, None, None, None))
    pos, rec_no = 0, 0
    n = len(blob)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and blob[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        hdr_end = blob.find(_CRLF2, pos)
        if hdr_end < 0:
            rows.append((shard, rec_no, "__truncated__",
                         None, None, None, None, None, None))
            break
        headers: dict[str, str] = {}
        head = blob[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        for line in head[1:]:  # line 0 is the WARC/1.0 version line
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            clen = -1
        if clen < 0:
            # missing/garbage/negative length: a negative value could move
            # the cursor BACKWARDS and loop forever — stop the shard here
            rows.append((shard, rec_no, "__truncated__",
                         None, None, None, None, None, None))
            break
        payload_start = hdr_end + 4
        if payload_start + clen > n:
            rows.append((shard, rec_no, "__truncated__",
                         headers.get("warc-target-uri"),
                         headers.get("warc-date"), None, None, None, None))
            break
        payload = blob[payload_start : payload_start + clen]
        wtype = headers.get("warc-type", "")
        status = ctype = body = bbytes = None
        if wtype == "response":
            status, ctype, body, bbytes = _parse_http_response(payload)
        rows.append((shard, rec_no, wtype,
                     headers.get("warc-target-uri"),
                     headers.get("warc-date"), status, ctype, body,
                     bbytes if keep_bytes else None))
        pos = payload_start + clen
        rec_no += 1
    pdf = pd.DataFrame(rows, columns=_COLS)
    return pdf if keep_bytes else pdf.drop(columns=["body_bytes"])


def _parse_http_response(payload: bytes):
    """HTTP response payload → (status, content_type, body_text, body_bytes)."""
    hdr_end = payload.find(_CRLF2)
    if hdr_end < 0:
        return None, None, payload.decode("utf-8", "replace"), payload
    head = payload[:hdr_end].decode("utf-8", "replace").split("\r\n")
    parts = head[0].split(" ")
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = None
    ctype = None
    for line in head[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
    raw = payload[hdr_end + 4 :]
    return status, ctype, raw.decode("utf-8", "replace"), raw


def records_from_binary_df(raw: DataFrame, keep_bytes: bool = False) -> DataFrame:
    """(path, content) binary rows → RECORD_SCHEMA rows.  The ONE parse
    entry point shared by the batch reader and the streaming drain, so the
    stream_warc streaming≡batch oracle can never mask a parser fork."""

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for shard, blob in zip(pdf["path"], pdf["content"]):
                yield parse_warc_stream(shard, bytes(blob), keep_bytes)

    schema = RECORD_SCHEMA_BYTES if keep_bytes else RECORD_SCHEMA
    return raw.select("path", "content").mapInPandas(expand, schema=schema)


def read_warc_records(
    spark: SparkSession, path: str, keep_bytes: bool = False
) -> DataFrame:
    """Read WARC shards at ``path`` (file/glob/dir) into record rows.

    ``rec_no`` counts every record in the shard stream; non-response records
    carry NULL http fields.  One binaryFile row per shard → one parse task
    per shard, no shuffle.  ``keep_bytes`` adds the raw HTTP body bytes
    (``body_bytes``) for the charset-sniff path (ops/charset.py)."""
    return records_from_binary_df(
        spark.read.format("binaryFile").load(path), keep_bytes
    )


# ---------------------------------------------------------------------------
# deterministic fixture writer (tests / driver oracle only — NOT the ingest
# path; builds CC-style .warc / .warc.gz shards from the documents table so
# the reader has real archives to chew on with no external data)
# ---------------------------------------------------------------------------

_EPOCH = datetime(2020, 1, 1)


def _corpus_stamp(sf_dir: str) -> str:
    """Content stamp of a corpus dir's documents table (file sizes +
    mtimes): fixture caches keyed only by PATH go stale when the same path
    is regenerated with different rows (the /tmp adversarial corpus across
    sessions)."""
    root = os.path.join(sf_dir, "documents.parquet")
    paths = (
        [root]
        if os.path.isfile(root)
        else sorted(
            os.path.join(root, f) for f in os.listdir(root) if f.endswith(".parquet")
        )
        if os.path.isdir(root)
        else []
    )
    return ";".join(
        f"{os.path.basename(p)}:{os.stat(p).st_size}:{os.stat(p).st_mtime_ns}"
        for p in paths
    )


def _fixture_body(doc_id: int, text: str | None) -> str:
    """Deterministic HTML body for a doc — replayed verbatim by the oracle
    SQL (entry_ext._SQL_WARC_INGEST), so keep it a pure concat of slices."""
    words = (text or "").split(" ")
    paras = "".join(
        "<p>" + " ".join(words[p * 12 : p * 12 + 12]) + "</p>"
        for p in range((len(words) + 11) // 12)
    )
    marker = "WARC/1.0\r\nnot a record boundary" if doc_id % 17 == 0 else ""
    return (
        f"<html><head><title>Doc {doc_id}</title></head>"
        f"<body>{paras}<!--{marker}--></body></html>"
    )


def _record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = "WARC/1.0\r\n" + "".join(f"{k}: {v}\r\n" for k, v in headers)
    head += f"Content-Length: {len(payload)}\r\n"
    return head.encode() + b"\r\n" + payload + b"\r\n\r\n"


def build_warc_fixture(
    spark: SparkSession, sf_dir: str, n_shards: int = 4
) -> str:
    """Deterministic WARC fixture derived from ``documents``: docs
    round-robin over ``n_shards`` shards in doc_id order; each shard opens
    with a ``warcinfo`` record; per doc one ``response`` record
    (url ``https://<source>/doc/<id>``, date epoch+doc_id seconds, HTTP 404
    with a short body when ``doc_id % 13 == 0`` else 200 with the HTML
    body), plus a ``request`` record when ``doc_id % 5 == 0``.  Every 17th
    doc's body embeds a literal ``WARC/1.0`` line (framing must use
    Content-Length, not magic scanning).  Even shards are written gzipped
    (``.warc.gz``, mtime=0).  Built once per (sf_dir, version) under the
    system temp dir."""
    import hashlib
    import tempfile

    tag = hashlib.md5(
        f"{sf_dir}|warc-v1|{n_shards}|{_corpus_stamp(sf_dir)}".encode()
    ).hexdigest()[:12]
    out_dir = os.path.join(tempfile.gettempdir(), f"chug_warc_fixture_{tag}")
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "source")
        .orderBy("doc_id")
        .collect()
    )
    shards: list[list[bytes]] = [[] for _ in range(n_shards)]
    for i in range(n_shards):
        shards[i].append(_record(
            [("WARC-Type", "warcinfo"),
             ("WARC-Date", "2020-01-01T00:00:00Z")],
            b"software: chug_spark-fixture\r\n",
        ))
    for i, r in enumerate(docs):
        did = int(r.doc_id)
        # None-only substitution (NOT `or`): an empty-string source must
        # round-trip as 'https:///doc/N' exactly like the oracle's coalesce
        src = "unknown" if r.source is None else r.source
        url = f"https://{src}/doc/{did}"
        date = (_EPOCH + timedelta(seconds=did)).strftime("%Y-%m-%dT%H:%M:%SZ")
        if did % 13 == 0:
            http = b"HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n\r\ngone"
        else:
            body = _fixture_body(did, r.text).encode()
            http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body)
        rec = _record(
            [("WARC-Type", "response"),
             ("WARC-Target-URI", url),
             ("WARC-Date", date),
             ("Content-Type", "application/http; msgtype=response")],
            http,
        )
        shard = shards[i % n_shards]
        shard.append(rec)
        if did % 5 == 0:
            shard.append(_record(
                [("WARC-Type", "request"),
                 ("WARC-Target-URI", url),
                 ("WARC-Date", date)],
                b"GET / HTTP/1.1\r\n",
            ))
    os.makedirs(out_dir, exist_ok=True)
    for i, recs in enumerate(shards):
        raw = b"".join(recs)
        if i % 2 == 0:
            path = os.path.join(out_dir, f"shard-{i:05d}.warc.gz")
            with open(path, "wb") as f:
                with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
                    gz.write(raw)
        else:
            path = os.path.join(out_dir, f"shard-{i:05d}.warc")
            with open(path, "wb") as f:
                f.write(raw)
    with open(marker, "w") as f:
        f.write(str(len(docs)))
    return out_dir


def build_warc_charset_fixture(
    spark: SparkSession, sf_dir: str, n_shards: int = 4
) -> str:
    """Deterministic WARC fixture for the charset-sniff path: one HTTP 200
    response per doc_id, body encoded per ``doc_id % 6`` —

    - 0: plain ASCII, no declarations (UTF-8 by validity probe);
    - 1: windows-1252 bytes carrying their own ``<meta charset>``;
    - 2: UTF-8 with BOM;
    - 3: UTF-16LE with BOM;
    - 4: ISO-8859-1 declared in the HTTP Content-Type header (body byte
      0xFF, invalid UTF-8 — header must outrank the probe);
    - 5: undeclared windows-1252 (0xE9 — probe fails, legacy fallback).

    The oracle SQL (entry_ext._SQL_WARC_CHARSET) states the ground truth
    per class, so the whole WARC bytes → HTTP parse → WHATWG sniff →
    decode chain is hash-checked end to end."""
    import hashlib
    import tempfile

    tag = hashlib.md5(
        f"{sf_dir}|warc-charset-v1|{n_shards}|{_corpus_stamp(sf_dir)}".encode()
    ).hexdigest()[:12]
    out_dir = os.path.join(tempfile.gettempdir(), f"chug_warc_cs_{tag}")
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    ids = [
        int(r.doc_id)
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id").orderBy("doc_id").collect()
    ]
    shards: list[list[bytes]] = [[] for _ in range(n_shards)]
    for i in range(n_shards):
        shards[i].append(_record(
            [("WARC-Type", "warcinfo"),
             ("WARC-Date", "2020-01-01T00:00:00Z")],
            b"software: chug_spark-charset-fixture\r\n",
        ))
    for i, did in enumerate(ids):
        m = did % 6
        ct = "text/html"
        if m == 0:
            body = f"Doc {did} plain.".encode("ascii")
        elif m == 1:
            body = f'<meta charset="windows-1252">caf\xe9 {did}'.encode(
                "latin-1"
            )
        elif m == 2:
            body = b"\xef\xbb\xbf" + f"Doc {did} plain.".encode("ascii")
        elif m == 3:
            body = b"\xff\xfe" + f"hi {did}".encode("utf-16le")
        elif m == 4:
            ct = "text/html; charset=ISO-8859-1"
            body = f"\xff doc {did}".encode("latin-1")
        else:
            body = f"caf\xe9 doc {did}".encode("latin-1")
        http = (
            f"HTTP/1.1 200 OK\r\nContent-Type: {ct}\r\n\r\n".encode("ascii")
            + body
        )
        date = (_EPOCH + timedelta(seconds=did)).strftime("%Y-%m-%dT%H:%M:%SZ")
        shards[i % n_shards].append(_record(
            [("WARC-Type", "response"),
             ("WARC-Target-URI", f"https://example.org/doc/{did}"),
             ("WARC-Date", date),
             ("Content-Type", "application/http; msgtype=response")],
            http,
        ))
    os.makedirs(out_dir, exist_ok=True)
    for i, recs in enumerate(shards):
        raw = b"".join(recs)
        if i % 2 == 0:
            path = os.path.join(out_dir, f"shard-{i:05d}.warc.gz")
            with open(path, "wb") as f:
                with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
                    gz.write(raw)
        else:
            path = os.path.join(out_dir, f"shard-{i:05d}.warc")
            with open(path, "wb") as f:
                f.write(raw)
    with open(marker, "w") as f:
        f.write(str(len(ids)))
    return out_dir
