"""Unicode text normalization (ftfy-lite): the cleanup pass every web
corpus runs before tokenization — undo the most common UTF-8-read-as-
latin1 mojibake, fold typographic punctuation to ASCII, strip zero-width
and control characters, collapse runs of whitespace.

Everything is a chain of ``replace``/``regexp_replace`` Column
expressions — map-only, codegen, pushes behind the scan, and reproduced
verbatim by the DuckDB oracle, so the whole pass is value-checked.  The
mojibake table is a deliberate, documented SUBSET (the high-frequency
pairs); a full ftfy is heuristic-search-based and would be a Python UDF —
wrong cost model for a 100-TB map stage.

Two stages, order matters: mojibake decodes to the *typographic*
character first (so genuine typographic input and repaired mojibake then
fold identically), punctuation folding second.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: UTF-8 bytes of a codepoint re-decoded as latin1/cp1252 — the classic
#: double-encoding artifact ("â€™" is what ’ becomes).  High-frequency
#: subset: curly quotes, dashes, ellipsis, and the common Western accents.
MOJIBAKE = (
    ("â€™", "’"),  # â€™ -> ’
    ("â€˜", "‘"),  # â€˜ -> ‘
    ("â€œ", "“"),  # â€œ -> “
    ("â€", "”"),  # ends in the raw 0x9D byte (cp1252-unmapped)
    ("â€“", "–"),  # â€“ -> –
    ("â€”", "—"),  # â€” -> —
    ("â€¦", "…"),  # â€¦ -> …
    ("Ã©", "é"),        # Ã© -> é
    ("Ã¨", "è"),        # Ã¨ -> è
    ("Ã¡", "á"),        # Ã¡ -> á
    ("Ã³", "ó"),        # Ã³ -> ó
    ("Ã±", "ñ"),        # Ã± -> ñ
    ("Ã¼", "ü"),        # Ã¼ -> ü
    ("Ã¶", "ö"),        # Ã¶ -> ö
)

#: typographic -> ASCII folds
PUNCT_FOLD = (
    ("’", "'"),
    ("‘", "'"),
    ("“", '"'),
    ("”", '"'),
    ("–", "-"),
    ("—", "-"),
    ("…", "..."),
    (" ", " "),  # NBSP
)

#: zero-width + BOM, removed outright
_ZERO_WIDTH_RE = "[​‌‍﻿]"
#: C0 controls except \t \n, plus DEL
_CONTROL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"


def normalize_unicode(text: Column) -> Column:
    """The full cleanup chain; NULL-safe (NULL stays NULL)."""
    s = text
    for bad, good in MOJIBAKE:
        s = F.replace(s, F.lit(bad), F.lit(good))
    for fancy, plain in PUNCT_FOLD:
        s = F.replace(s, F.lit(fancy), F.lit(plain))
    s = F.regexp_replace(s, _ZERO_WIDTH_RE, "")
    s = F.regexp_replace(s, _CONTROL_RE, " ")
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def text_normalize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text_norm, changed) per doc — map-only."""
    norm = normalize_unicode(F.col(text_col))
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        norm.alias("text_norm"),
        (~norm.eqNullSafe(F.col(text_col))).alias("changed"),
    )


def normalize_unicode_sql(expr: str) -> str:
    """The identical chain as DuckDB SQL over ``expr`` (oracle twin)."""

    def q(s: str) -> str:
        return s.replace("'", "''")

    out = expr
    for bad, good in MOJIBAKE:
        out = f"replace({out}, '{q(bad)}', '{q(good)}')"
    for fancy, plain in PUNCT_FOLD:
        out = f"replace({out}, '{q(fancy)}', '{q(plain)}')"
    out = f"regexp_replace({out}, '{_ZERO_WIDTH_RE}', '', 'g')"
    out = f"regexp_replace({out}, '{_CONTROL_RE}', ' ', 'g')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"


# ---------------------------------------------------------------------------
# Hard-wrap repair: the PDF-text-layer cleanup pass.  Text layers and OCR
# dumps arrive hard-wrapped at the rendered line width, with words split by
# end-of-line hyphens; before tokenization the wraps must be undone without
# destroying real paragraph breaks or real hyphenated compounds.  Same cost
# model as the mojibake pass: a fixed chain of regexp_replace Column
# expressions — map-only, codegen, oracle-mirrored verbatim.
#
# Stage order matters:
#  1. soft hyphen wrap  ([a-z])-\n([a-z])  -> $1$2   (a word the renderer
#     split: lowercase on both sides of the break; the hyphen is an
#     artifact and is removed)
#  2. hard hyphen wrap  ([A-Za-z0-9])-\n([A-Z0-9]) -> $1-$2  (a real
#     hyphenated compound that happened to break at the hyphen:
#     capital/digit continuation; the hyphen is kept, the wrap removed)
#  3. paragraph protection: runs of 2+ newlines are a paragraph break
#     (sentinel \x01), remaining single newlines are soft line wraps and
#     become spaces, sentinels become exactly one blank line.
# ---------------------------------------------------------------------------

#: (pattern, java_replacement, re2_replacement, chars_removed_per_match)
_UNWRAP_STAGES = (
    (r"([a-z])-\n([a-z])", "$1$2", r"\1\2"),
    (r"([A-Za-z0-9])-\n([A-Z0-9])", "$1-$2", r"\1-\2"),
)


def unwrap_hard_lines(text: Column) -> Column:
    """Undo hard line wraps; NULL-safe.  Returns the unwrapped text with
    paragraph breaks normalized to exactly one blank line."""
    s = text
    for pat, java_rep, _ in _UNWRAP_STAGES:
        s = F.regexp_replace(s, pat, java_rep)
    s = F.regexp_replace(s, r"\n{2,}", "\x01")
    s = F.regexp_replace(s, r"\n", " ")
    s = F.regexp_replace(s, "\x01", "\n\n")
    return s


def line_unwrap(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, clean_text, n_soft, n_hard, n_paras) per doc — map-only.

    ``n_soft``/``n_hard`` count the two hyphen-repair classes (derived
    from length deltas: a soft repair removes exactly '-\\n', a hard one
    exactly '\\n'); ``n_paras`` counts paragraphs after unwrapping.
    """
    raw = F.col(text_col)
    s1 = F.regexp_replace(raw, *_UNWRAP_STAGES[0][:2])
    s2 = F.regexp_replace(s1, *_UNWRAP_STAGES[1][:2])
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(s2, r"\n{2,}", "\x01"), r"\n", " "
        ),
        "\x01", "\n\n",
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        clean.alias("clean_text"),
        ((F.length(raw) - F.length(s1)) / 2).cast("int").alias("n_soft"),
        (F.length(s1) - F.length(s2)).cast("int").alias("n_hard"),
        F.size(F.split(clean, r"\n\n")).cast("int").alias("n_paras"),
    )


def unwrap_hard_lines_sql(expr: str) -> str:
    """The identical chain as DuckDB SQL over ``expr`` (oracle twin).

    DuckDB plain string literals keep backslashes verbatim, so ``'\\n'``
    reaches RE2 as the two-char escape and matches a newline, same as the
    Java side; the \\x01 sentinel is spelled ``chr(1)``.
    """
    out = expr
    for pat, _, re2_rep in _UNWRAP_STAGES:
        out = f"regexp_replace({out}, '{pat}', '{re2_rep}', 'g')"
    out = f"regexp_replace({out}, '\\n{{2,}}', chr(1), 'g')"
    out = f"regexp_replace({out}, '\\n', ' ', 'g')"
    return f"replace({out}, chr(1), chr(10) || chr(10))"
