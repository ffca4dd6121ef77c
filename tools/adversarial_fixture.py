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
    # giant doc: 2000 words -> 250 pages; exercises the per-doc fan-out,
    # the decode chunk cap (ceil(pages/4) sub-rows), and oracle
    # generate_series at two orders of magnitude above the clean corpus
    (9009, " ".join(f"w{i}" for i in range(2000)), "en", "srcD", 12000),
    # one enormous unbroken token: shingle/chunk/regex paths must not
    # assume words are short
    (9010, "x" * 5000 + " tail words here", "en", "srcA", 5016),
    # html/regex metacharacters in source + an uncommon lang tag: the
    # synthesis-based oracles (html/dom/corpus_report) must escape or
    # tolerate them identically to the Column chains
    (9011, "plain words with spicy origin marker", "zz-Latn", 'ev<il>&"q"\\', 36),
]

# Hostile events rows: NULL value / event_type / user_id / props / ts, plus a
# duplicate (user_id, ts) pair — window ORDER BY with NULLs is where Spark
# (NULLS FIRST asc) and DuckDB (NULLS LAST asc) silently disagree.
ADVERSARIAL_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    (99001, "2024-03-01 00:00:00", 1, "click", None, "{}"),
    (99002, "2024-03-01 00:00:01", 1, None, 1.5, None),
    (99003, "2024-03-01 00:00:02", None, "view", 2.5, "{}"),
    (99004, None, 2, "click", 3.5, "{}"),
    (99005, "2024-03-01 00:00:03", 2, "view", 4.5, "{}"),
    (99006, "2024-03-01 00:00:03", 2, "click", 5.5, "{}"),  # dup (user, ts)
]

# Hostile embeddings rows: the all-zero vector (cosine 0/0), a NULL embedding,
# a NULL label, and an exact duplicate of another hostile vector.
_DIM = 64
ADVERSARIAL_EMBEDDINGS = [
    # (vec_id, embedding, label)
    (99001, [0.0] * _DIM, 1),
    (99002, None, 2),
    (99003, [1.0] + [0.0] * (_DIM - 1), None),
    (99004, [1.0] + [0.0] * (_DIM - 1), 3),
]


def build(src: str = "/root/testdata/sf0.001", dst: str = "/tmp/sfadv") -> str:
    import duckdb

    rewritten = {"documents.parquet", "events.parquet", "embeddings.parquet"}
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for f in os.listdir(src):
        if f not in rewritten:
            os.symlink(os.path.join(src, f), os.path.join(dst, f))
    con = duckdb.connect()

    con.sql(
        "CREATE TABLE adv_docs (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO adv_docs VALUES (?, ?, ?, ?, ?)", ADVERSARIAL_DOCS)
    con.sql(
        f"COPY (SELECT * FROM '{src}/documents.parquet' UNION ALL "
        f"SELECT * FROM adv_docs ORDER BY doc_id) TO '{dst}/documents.parquet' "
        "(FORMAT PARQUET)"
    )

    # ts must stay timestamp[us] isAdjustedToUTC=false to match the driver
    # tables (the engine pins the read with TIMESTAMP_NTZ).
    con.sql(
        "CREATE TABLE adv_events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany(
        "INSERT INTO adv_events VALUES (?, ?, ?, ?, ?, ?)", ADVERSARIAL_EVENTS
    )
    con.sql(
        f"COPY (SELECT * FROM '{src}/events.parquet' UNION ALL "
        f"SELECT * FROM adv_events ORDER BY event_id) TO '{dst}/events.parquet' "
        "(FORMAT PARQUET)"
    )

    con.sql(
        "CREATE TABLE adv_emb (vec_id BIGINT, embedding FLOAT[], label INTEGER)"
    )
    con.executemany("INSERT INTO adv_emb VALUES (?, ?, ?)", ADVERSARIAL_EMBEDDINGS)
    con.sql(
        f"COPY (SELECT * FROM '{src}/embeddings.parquet' UNION ALL "
        f"SELECT * FROM adv_emb ORDER BY vec_id) TO '{dst}/embeddings.parquet' "
        "(FORMAT PARQUET)"
    )
    return dst


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfadv"
    print(build(src, dst))
