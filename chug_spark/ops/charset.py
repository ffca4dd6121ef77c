"""Charset sniffing + text decode for fetched web payloads — the step
between raw WARC/HTTP bytes and every text operator downstream.  Follows
the WHATWG encoding-sniffing precedence: BOM > HTTP Content-Type charset
> in-document meta/XML declaration > UTF-8 validity probe > windows-1252
fallback (the web's legacy default).

Everything is pure Column work — map-only, zero shuffle, zero Python:

- BOM detection is a prefix test on ``hex(payload)`` (UTF-32 variants
  checked before their UTF-16 prefixes).
- UTF-8 validity is Spark's native ``is_valid_utf8`` over the raw
  binary — linear, iterative, constant stack.  (The RFC 3629 hex-regex
  grammar below is kept as the executable REFERENCE for the property
  test; it is no longer the engine path: Java's regex engine recurses
  once per ``(?:...)*`` iteration, and a payload beyond ~5-10 KB
  overflows the task stack — found by the adversarial giant-token doc.)
- The meta scan decodes a bounded prefix as ISO-8859-1 (total — every
  byte sequence decodes) and regex-extracts declarations ONLY: a
  ``charset=`` inside a ``<meta ...>`` tag or an ``encoding=`` inside a
  leading ``<?xml ?>`` declaration (WHATWG prescan) — never free text
  like a ``?encoding=json`` query string in an anchor.
- UTF-16 decode is guarded by an RFC 2781 validity check (unit tiling +
  surrogate pairing) — odd lengths and lone surrogates fall back to the
  total ISO-8859-1 decode instead of raising under ANSI.  Evaluated as a
  higher-order expression over the 4-hex-char unit array (same
  stack-safety rationale as the UTF-8 probe; the regex constants remain
  as the reference grammar).
- Decode uses the JVM charsets Spark exposes; windows-1252 is
  approximated by ISO-8859-1 (identical except 0x80-0x9F, where 1252
  maps printables — documented, and the sniff still REPORTS
  windows-1252).  UTF-32 payloads are detected but decode to NULL
  (charset reported; Spark's decode() has no UTF-32).

A declared-UTF-8 payload that fails the validity probe decodes as
ISO-8859-1 instead of raising — at 10^12 docs a single mislabeled page
must never kill the stage (same policy as the WARC truncation rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (hex prefix, reported charset, BOM length in bytes) — longest first so
#: UTF-32 BOMs win over their UTF-16 prefixes
_BOMS = (
    ("0000FEFF", "utf-32be", 4),
    ("FFFE0000", "utf-32le", 4),
    ("EFBBBF", "utf-8", 3),
    ("FEFF", "utf-16be", 2),
    ("FFFE", "utf-16le", 2),
)

_CONT = "[89AB][0-9A-F]"  # one UTF-8 continuation byte, over hex pairs

#: RFC 3629 well-formed byte sequences, as a regex over hex(payload)
UTF8_HEX_RE = (
    "^(?:"
    "[0-7][0-9A-F]"                      # 00-7F
    f"|C[2-9A-F]{_CONT}|D[0-9A-F]{_CONT}"  # C2-DF
    f"|E0[AB][0-9A-F]{_CONT}"            # E0 A0-BF
    f"|E[1-9A-C]{_CONT}{_CONT}"          # E1-EC
    f"|ED[89][0-9A-F]{_CONT}"            # ED 80-9F (no surrogates)
    f"|E[EF]{_CONT}{_CONT}"              # EE-EF
    f"|F0[9AB][0-9A-F]{_CONT}{_CONT}"    # F0 90-BF
    f"|F[1-3]{_CONT}{_CONT}{_CONT}"      # F1-F3
    f"|F48[0-9A-F]{_CONT}{_CONT}"        # F4 80-8F (4 bytes, <= U+10FFFF)
    ")*$"
)

#: RFC 2781 well-formed UTF-16 code-unit sequences over hex(body): every
#: unit is either a non-surrogate or a high surrogate (D800-DBFF)
#: immediately followed by a low surrogate (DC00-DFFF).  The 4-hex-char
#: unit tiling also rejects odd byte counts, so these subsume the
#: even-length guard.  In LE hex the HIGH byte is the SECOND pair.
_U16_NOSUR = "(?:[0-9ABCEF][0-9A-F]|D[0-7])"  # high byte not in D8-DF
UTF16LE_HEX_RE = (
    f"^(?:[0-9A-F]{{2}}{_U16_NOSUR}"
    f"|[0-9A-F]{{2}}D[89AB][0-9A-F]{{2}}D[CDEF])*$"
)
UTF16BE_HEX_RE = (
    f"^(?:{_U16_NOSUR}[0-9A-F]{{2}}"
    f"|D[89AB][0-9A-F]{{2}}D[CDEF][0-9A-F]{{2}})*$"
)

#: header Content-Type parameter: charset= anywhere in the VALUE is the
#: grammar (RFC 9110) — unlike the in-document scan below
_HDR_LABEL_RE = r"""(?i)charset\s*=\s*["']?\s*([A-Za-z0-9._:-]+)"""
#: in-document declarations ONLY (WHATWG prescan): a charset= inside a
#: <meta ...> tag (covers both <meta charset=..> and http-equiv
#: content="...; charset=.."), or encoding= inside a LEADING <?xml ?>
#: declaration — never script/anchor text like '?encoding=json'
_META_TAG_RE = r"""(?is)<meta[^>]{0,512}?charset\s*=\s*["']?\s*([A-Za-z0-9._:-]+)"""
_XML_DECL_RE = r"""(?is)^\s{0,64}<\?xml[^>]{0,256}?encoding\s*=\s*["']\s*([A-Za-z0-9._:-]+)"""


def _utf16_valid(bhex: Column, hi_off: int) -> Column:
    """RFC 2781 validity (unit tiling + surrogate pairing) over
    ``hex(body)``, evaluated ITERATIVELY.

    ``hi_off`` is the 1-based position of the HIGH byte's first hex char
    inside a 4-hex-char code unit: 3 for LE (high byte second), 1 for BE.
    The equivalent ``(?:...)*`` regex grammar (:data:`UTF16LE_HEX_RE` /
    :data:`UTF16BE_HEX_RE`, kept as reference) recurses once per unit in
    Java's engine and overflows the task stack beyond ~10 KB of hex, so
    the check walks the unit array with higher-order functions instead:
    every unit is a non-surrogate, or a high surrogate whose successor is
    a low surrogate, and every low surrogate's predecessor is a high —
    linear work, constant stack, whole-stage codegen.
    """
    # NOTE: the pairing lambdas below reference ``units`` (this full-string
    # regexp_extract_all) again via F.get(units, i±1); linear cost relies on
    # Spark evaluating the subexpression once per row rather than re-running
    # the extraction per element (holds on 4.1.x — the 240 KB regression
    # test in tests/test_charset.py would catch an evaluation-strategy
    # change reintroducing quadratic work).  (ADVICE r5)
    units = F.regexp_extract_all(bhex, F.lit("(.{4})"), 1)

    def hi_nib(u: Column) -> Column:
        return F.substring(u, hi_off, 1)

    def lo_nib(u: Column) -> Column:
        return F.substring(u, hi_off + 1, 1)

    def is_hi(u: Column) -> Column:
        return (hi_nib(u) == "D") & lo_nib(u).isin("8", "9", "A", "B")

    def is_lo(u: Column) -> Column:
        return (hi_nib(u) == "D") & lo_nib(u).isin("C", "D", "E", "F")

    paired = F.forall(
        F.transform(
            units,
            lambda u, i: (
                (~is_hi(u)) | is_lo(F.coalesce(F.get(units, i + 1), F.lit("")))
            )
            & (
                (~is_lo(u)) | is_hi(F.coalesce(F.get(units, i - 1), F.lit("")))
            ),
        ),
        lambda ok: ok,
    )
    return (F.length(bhex) % 4 == 0) & paired


def normalize_label(label: Column) -> Column:
    """lowercased charset label with the common aliases folded (utf8,
    latin-1/iso8859-1, ascii, cp1252 families).  Per the WHATWG encoding
    registry the bare ``utf-16``/``unicode`` labels decode little-endian,
    so they fold to utf-16le (a BOM, checked first, overrides)."""
    lab = F.lower(F.trim(label))
    return (
        F.when(lab.isin("utf8", "utf-8"), "utf-8")
        .when(lab.isin("latin1", "latin-1", "iso8859-1", "iso-8859-1", "l1"),
              "iso-8859-1")
        .when(lab.isin("ascii", "us-ascii"), "us-ascii")
        .when(lab.isin("cp1252", "windows-1252", "win-1252", "x-cp1252"),
              "windows-1252")
        .when(lab.isin("utf-16", "utf16", "unicode", "utf-16le"), "utf-16le")
        .otherwise(lab)
    )


def detect_charset(
    payloads: DataFrame,
    payload_col: str = "payload",
    header_ct_col: str | None = None,
    meta_prefix_bytes: int = 2048,
) -> DataFrame:
    """All input columns plus (bom, hdr_charset, meta_charset, utf8_valid,
    charset, bom_len) — the WHATWG-precedence sniff verdict per payload.

    ``header_ct_col`` optionally names an HTTP Content-Type column whose
    ``charset=`` parameter outranks the in-document meta (but never a
    BOM).  NULL payloads report charset NULL."""
    hx = F.hex(F.col(payload_col))
    bom = F.lit(None).cast("string")
    bom_len = F.lit(0)
    for prefix, name, blen in _BOMS:
        hit = hx.startswith(prefix)
        bom = F.when(hit & bom.isNull(), F.lit(name)).otherwise(bom)
        bom_len = F.when(bom == name, F.lit(blen)).otherwise(bom_len)
    hdr = (
        normalize_label(F.regexp_extract(F.col(header_ct_col), _HDR_LABEL_RE, 1))
        if header_ct_col
        else F.lit("")
    )
    prefix_txt = F.decode(
        F.col(payload_col).substr(F.lit(1), F.lit(meta_prefix_bytes)),
        "ISO-8859-1",
    )
    # declaration-scoped scan: meta tag first, leading XML decl second —
    # a stray 'encoding=json' in script/anchor text must never outrank the
    # UTF-8 validity probe and NULL a decodable page
    raw_meta = F.regexp_extract(prefix_txt, _META_TAG_RE, 1)
    raw_xml = F.regexp_extract(prefix_txt, _XML_DECL_RE, 1)
    meta = normalize_label(F.when(raw_meta != "", raw_meta).otherwise(raw_xml))
    # native linear validity — NOT the hex regex (Java regex recursion
    # overflows the task stack on multi-KB payloads; see module docstring)
    utf8_ok = F.is_valid_utf8(F.col(payload_col))
    charset = (
        F.when(F.col(payload_col).isNull(), F.lit(None).cast("string"))
        .when(bom.isNotNull(), bom)
        .when(hdr != "", hdr)
        .when(meta != "", meta)
        .when(utf8_ok, F.lit("utf-8"))
        .otherwise(F.lit("windows-1252"))
    )
    return payloads.select(
        "*",
        bom.alias("bom"),
        F.nullif(hdr, F.lit("")).alias("hdr_charset"),
        F.nullif(meta, F.lit("")).alias("meta_charset"),
        utf8_ok.alias("utf8_valid"),
        charset.alias("charset"),
        bom_len.cast("int").alias("bom_len"),
    )


def decode_payload_text(
    sniffed: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Adds ``text``: the payload decoded per the sniffed charset, BOM
    stripped.  Total — a declared-utf-8 body that fails the validity
    probe decodes as ISO-8859-1 (never raises); charsets Spark cannot
    decode (utf-32*, exotic labels) yield NULL text, charset retained."""
    body = F.col(payload_col).substr(
        F.col("bom_len") + 1, F.length(F.col(payload_col))
    )
    cs = F.col("charset")
    latin1ish = cs.isin("iso-8859-1", "windows-1252", "us-ascii")
    # RFC 2781 validity guards: under default-ANSI Spark 4 decode() raises
    # on malformed UTF-16 (odd byte count, lone/unpaired surrogates) and
    # would kill the stage — mislabeled or truncated pages fall back to
    # the total ISO-8859-1 decode instead.  The unit-tiling regexes also
    # reject odd lengths, subsuming the old even-length guard.
    bhex = F.hex(body)
    le_ok = _utf16_valid(bhex, hi_off=3)
    be_ok = _utf16_valid(bhex, hi_off=1)
    text = (
        F.when(cs.isNull(), F.lit(None).cast("string"))
        .when((cs == "utf-8") & F.col("utf8_valid"), F.decode(body, "UTF-8"))
        .when(cs == "utf-8", F.decode(body, "ISO-8859-1"))
        .when((cs == "utf-16le") & le_ok, F.decode(body, "UTF-16LE"))
        .when((cs == "utf-16be") & be_ok, F.decode(body, "UTF-16BE"))
        .when(cs.isin("utf-16le", "utf-16be"), F.decode(body, "ISO-8859-1"))
        .when(latin1ish, F.decode(body, "ISO-8859-1"))
        .otherwise(F.lit(None).cast("string"))
    )
    return sniffed.select("*", text.alias("text"))
