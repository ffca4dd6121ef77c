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
