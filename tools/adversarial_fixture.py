"""Build the adversarial contract fixture: a scale-factor directory whose
``documents`` table is the clean table plus 8 hostile rows (NULL text, empty
text, single-word, unicode/emoji, runs of spaces + trailing space, NULL lang,
NULL source, punctuation soup, embedded tab/newline).

Every ``queries()`` entry and its DuckDB oracle must agree on this corpus as
well as on the clean one — r5 hardened all 107 entries against it (the clean
driver fixtures never exercise NULL text, so a NULL-semantics divergence
between Spark and the oracle SQL would otherwise ship silently and only
surface when the driver regenerates testdata).

Usage:
    python tools/adversarial_fixture.py [src_sf_dir] [dst_dir]
    python tools/check_entry.py <dst_dir>            # the adversarial gate

Defaults: src=/root/testdata/sf0.001, dst=/tmp/sfadv.  Non-documents tables
are symlinked from src; documents.parquet is rewritten with the extra rows.
"""

from __future__ import annotations

import os
import shutil
import sys

ADVERSARIAL_DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (9001, None, "en", "srcA", 150),
    (9002, "", "en", "srcA", 150),
    (9003, "single", "es", "srcB", 6),
    (9004, "naïve café — résumé über straße 日本語 テスト emoji 🙂 end", "de", "srcB", 200),
    (9005, "two  spaces   here and trailing space ", None, "srcC", 300),
    (9006, "normal words but null source and lang present here okay fine", "fr", None, 500),
    (9007, "UPPER Case MiXeD Punct!!! ??? ,,, ;;; :: () [] {} quoted \"text\" and 'more'", "en", "srcC", 90),
    (9008, "tab\tseparated\twords\tand\nnewline embedded here", "en", "srcD", 45),
]


def build(src: str = "/root/testdata/sf0.001", dst: str = "/tmp/sfadv") -> str:
    import duckdb

    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for f in os.listdir(src):
        if f != "documents.parquet":
            os.symlink(os.path.join(src, f), os.path.join(dst, f))
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE adv (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO adv VALUES (?, ?, ?, ?, ?)", ADVERSARIAL_DOCS)
    con.sql(
        f"COPY (SELECT * FROM '{src}/documents.parquet' UNION ALL "
        f"SELECT * FROM adv ORDER BY doc_id) TO '{dst}/documents.parquet' "
        "(FORMAT PARQUET)"
    )
    return dst


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfadv"
    print(build(src, dst))
