"""Charset sniffing + decode (ops/charset.py): WHATWG precedence, BOMs,
UTF-8 validity grammar, meta/header labels, never-dies decode."""

import re

from pyspark.sql import functions as F

from chug_spark.ops.charset import (
    UTF8_HEX_RE,
    decode_payload_text,
    detect_charset,
)


def _detect(spark, rows, header=False):
    schema = "doc_id long, payload binary" + (", ct string" if header else "")
    df = spark.createDataFrame(rows, schema)
    out = decode_payload_text(
        detect_charset(df, header_ct_col="ct" if header else None)
    )
    return {r.doc_id: r for r in out.collect()}


def test_utf8_hex_grammar_is_exact():
    # pure-Python parity: the hex regex must agree with bytes.decode
    cases = [
        b"plain ascii",
        "héllo wörld €".encode("utf-8"),
        "\U0001f600 astral".encode("utf-8"),
        b"\xff\x41",            # lone invalid byte
        b"\xc3",                # truncated 2-byte seq
        b"\xc0\xaf",            # overlong encoding
        b"\xed\xa0\x80",        # surrogate half
        b"\xf4\x90\x80\x80",    # > U+10FFFF
        b"\xf4\x80\x80\x80",    # valid 4-byte F4 plane (U+100000)
        b"\xf4\x80\x80\x80\x80",  # valid F4 seq + lone continuation
        "\U00100000".encode("utf-8") + b" tail",
        b"\xe0\xa0\x80",        # minimal valid 3-byte
        b"",
    ]
    rx = re.compile(UTF8_HEX_RE)
    for b in cases:
        try:
            b.decode("utf-8")
            valid = True
        except UnicodeDecodeError:
            valid = False
        assert bool(rx.match(b.hex().upper())) == valid, b


def test_bom_precedence_and_decode(spark):
    got = _detect(
        spark,
        [
            (1, "﻿hi".encode("utf-8")),        # utf-8 BOM
            (2, "hi".encode("utf-16-le")),           # no BOM -> not utf16
            (3, b"\xff\xfeh\x00i\x00"),              # utf-16le BOM
            (4, b"\xfe\xff\x00h\x00i"),              # utf-16be BOM
            (5, b"\xff\xfe\x00\x00h\x00\x00\x00"),   # utf-32le BOM wins over 16le
            (6, b"\xff\xfeh\x00i"),                  # utf-16le BOM, odd body
        ],
    )
    assert (got[1].bom, got[1].charset, got[1].text) == ("utf-8", "utf-8", "hi")
    assert got[2].bom is None
    assert (got[3].charset, got[3].text) == ("utf-16le", "hi")
    assert (got[4].charset, got[4].text) == ("utf-16be", "hi")
    assert (got[5].charset, got[5].bom_len, got[5].text) == ("utf-32le", 4, None)
    assert got[6].charset == "utf-16le" and got[6].text is not None  # latin1 fallback


def test_header_meta_validity_precedence(spark):
    meta = b'<meta charset="ISO-8859-1"><p>caf\xe9</p>'
    got = _detect(
        spark,
        [
            (1, meta, None),                                  # meta wins
            (2, meta, "text/html; charset=UTF8"),             # header beats meta
            (3, "café".encode("utf-8"), None),           # validity probe
            (4, b"caf\xe9", None),                            # invalid -> cp1252
            (5, "﻿x".encode("utf-8"), "text/html; charset=latin1"),  # BOM beats header
            (6, b'<?xml version="1.0" encoding="utf8"?><a/>', None),      # xml decl + alias
        ],
        header=True,
    )
    assert (got[1].meta_charset, got[1].charset, got[1].text) == (
        "iso-8859-1", "iso-8859-1", '<meta charset="ISO-8859-1"><p>café</p>'
    )
    assert (got[2].hdr_charset, got[2].charset) == ("utf-8", "utf-8")
    # declared utf-8 but the é byte is invalid -> total latin1 decode
    assert got[2].text == '<meta charset="ISO-8859-1"><p>café</p>'
    assert (got[3].charset, got[3].text) == ("utf-8", "café")
    assert (got[4].charset, got[4].utf8_valid, got[4].text) == (
        "windows-1252", False, "café"
    )
    assert got[5].charset == "utf-8"
    assert (got[6].meta_charset, got[6].charset) == ("utf-8", "utf-8")


def test_null_and_empty_payloads_never_throw(spark):
    got = _detect(spark, [(1, None), (2, b"")])
    assert got[1].charset is None and got[1].text is None
    # empty payload: vacuously valid utf-8 -> empty text
    assert (got[2].charset, got[2].text) == ("utf-8", "")


def test_map_only_plan(spark):
    df = spark.createDataFrame([(1, b"x")], "doc_id long, payload binary")
    plan = decode_payload_text(detect_charset(df))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_f4_plane_decodes_not_stage_kills(spark):
    """Valid F4-lead UTF-8 (U+100000+) must pass the probe and decode;
    an invalid F4 run must fall back, never raise (review finding: the
    old grammar tiled F4 sequences as 5 bytes)."""
    got = _detect(spark, [
        (1, "\U00100000 ok".encode("utf-8")),
        (2, b"\xf4\x80\x80\x80\x80"),  # trailing lone continuation byte
    ])
    assert got[1].utf8_valid and got[1].text == "\U00100000 ok"
    assert not got[2].utf8_valid and got[2].charset == "windows-1252"
    assert got[2].text is not None  # total decode, no exception


def test_lone_surrogate_utf16_falls_back(spark):
    """A BOM'd UTF-16 body with a lone surrogate (or truncated pair) must
    fall back to the total ISO-8859-1 decode instead of raising under
    ANSI (review finding: the even-length guard was not enough)."""
    got = _detect(spark, [
        (1, b"\xff\xfe\x00\xd8"),               # lone high surrogate, even
        (2, b"\xff\xfe" + "ok".encode("utf-16-le")
            + b"\x00\xd8h\x00"),                 # unpaired high mid-stream
        (3, b"\xff\xfe" + "\U0001f600".encode("utf-16-le")),  # proper pair
    ])
    assert got[1].charset == "utf-16le" and got[1].text == "\x00\xd8"
    assert got[2].text is not None  # fallback, not an exception
    assert got[3].text == "\U0001f600"


def test_meta_scan_ignores_free_text_labels(spark):
    """'encoding=json' in an href and 'document.charset=x' in script text
    are NOT declarations; the UTF-8 probe must win (review finding: the
    old scan nulled such pages)."""
    got = _detect(spark, [
        (1, b'<a href="/api?encoding=json">x</a> body words'),
        (2, b"<script>document.charset='x'</script> more"),
        (3, b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=iso-8859-1">y'),
        (4, b'<?xml version="1.0" encoding="UTF8"?><d>z</d>'),
    ])
    assert got[1].meta_charset is None and got[1].charset == "utf-8"
    assert got[1].text is not None
    assert got[2].meta_charset is None and got[2].charset == "utf-8"
    assert got[3].meta_charset == "iso-8859-1"  # real meta declaration
    assert got[4].meta_charset == "utf-8"       # leading XML declaration


def test_declared_utf16_label_decodes_le(spark):
    """A header-declared bare 'utf-16' label folds to utf-16le (WHATWG
    registry) and the BOM-less body decodes (review finding: the old
    'utf-16' label had no decode branch -> NULL text)."""
    got = _detect(
        spark,
        [(1, "hi there".encode("utf-16-le"),
          "text/html; charset=UTF-16")],
        header=True,
    )
    assert got[1].charset == "utf-16le"
    assert got[1].text == "hi there"


def test_giant_payload_stack_safety(spark):
    """Multi-KB payloads must sniff + decode without JVM StackOverflow.

    Regression: the original hex-regex validity probes recursed once per
    byte/unit in Java's regex engine; a ~5 KB payload overflowed the task
    stack (found by the adversarial giant-token doc via web_pipeline2).
    The engine path is now is_valid_utf8 + an iterative HOF unit check.
    """
    from chug_spark.ops.charset import decode_payload_text, detect_charset

    big_ascii = ("x" * 5000 + " tail ") * 40          # ~200 KB utf-8/ascii
    big_utf16 = ("hi " * 40000).encode("utf-16-le")   # ~240 KB, no BOM
    bad_utf16 = big_utf16 + b"\x00\xd8"               # trailing lone high
    rows = [
        (1, bytearray(big_ascii.encode("utf-8"))),
        (2, bytearray(b"\xff\xfe") + bytearray(big_utf16)),
        (3, bytearray(b"\xff\xfe") + bytearray(bad_utf16)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r.doc_id: r
        for r in decode_payload_text(detect_charset(df)).collect()
    }
    assert out[1].charset == "utf-8" and out[1].text == big_ascii
    assert out[2].charset == "utf-16le"
    assert out[2].text == "hi " * 40000
    # malformed giant utf-16: guard rejects, total latin-1 fallback
    assert out[3].charset == "utf-16le" and out[3].text is not None
