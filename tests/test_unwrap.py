"""Hard-wrap repair (ops/textnorm.line_unwrap): semantics + engine parity."""

import duckdb
import pytest

from chug_spark.ops.textnorm import line_unwrap, unwrap_hard_lines_sql

CASES = [
    # (raw, expected_clean, n_soft, n_hard)
    ("exam-\nple more", "example more", 1, 0),
    ("Navier-\nStokes flow", "Navier-Stokes flow", 0, 1),
    ("ISO-\n9001 cert", "ISO-9001 cert", 0, 1),
    # documented false positive of the classic heuristic: a real compound
    # breaking at a lowercase-lowercase hyphen loses the hyphen
    ("state-of-\nthe-art", "state-ofthe-art", 1, 0),
    # space before the hyphen: no word character adjacency, wrap becomes
    # a plain line merge and the dash survives
    ("x -\ny", "x - y", 0, 0),
    ("a b\nc d\n\nnew para", "a b c d\n\nnew para", 0, 0),
    ("three\n\n\n\nnewlines", "three\n\nnewlines", 0, 0),
    # punctuation continuation: neither hyphen rule fires, line merge only
    ("odd-\n'quote", "odd- 'quote", 0, 0),
    ("plain text", "plain text", 0, 0),
]


def test_line_unwrap_semantics(spark):
    rows = [(i, raw) for i, (raw, _, _, _) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in line_unwrap(df).collect()}
    for i, (raw, clean, n_soft, n_hard) in enumerate(CASES):
        r = got[i]
        assert r.clean_text == clean, (raw, r.clean_text)
        assert r.n_soft == n_soft, (raw, r.n_soft)
        assert r.n_hard == n_hard, (raw, r.n_hard)
        assert r.n_paras == clean.count("\n\n") + 1


def test_line_unwrap_null_safe(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = line_unwrap(df).collect()[0]
    assert r.clean_text is None and r.n_soft is None


def test_unwrap_sql_twin_parity(spark):
    """The DuckDB chain in unwrap_hard_lines_sql must produce byte-identical
    output to the Spark chain on every case — the oracle contract."""
    con = duckdb.connect()
    con.execute("CREATE TABLE c (i INT, raw VARCHAR)")
    for i, (raw, _, _, _) in enumerate(CASES):
        con.execute("INSERT INTO c VALUES (?, ?)", [i, raw])
    duck = dict(
        con.sql(
            f"SELECT i, {unwrap_hard_lines_sql('raw')} FROM c"
        ).fetchall()
    )
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _, _, _) in enumerate(CASES)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.clean_text for r in line_unwrap(df).collect()}
    for i, (raw, _, _, _) in enumerate(CASES):
        assert duck[i] == got[i], (raw, duck[i], got[i])


SENT_CASES = [
    "First sentence. Second one! Third? Yes.",
    "Dr. Smith met Mr. Jones, e.g. at noon. Then left.",
    "No boundary here",
    "Trailing period.",
    "Multi   space.  Next.",
    "Fig. 3 shows etc. and i.e. usage. Done!",
    "",
    None,
]


def test_sentence_split_semantics(spark):
    from chug_spark.ops.textstats import sentence_split

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(SENT_CASES)], "doc_id long, text string"
    )
    got = {}
    for r in sentence_split(df).collect():
        got.setdefault(r.doc_id, []).append((r.sent_no, r.sentence))
    assert [s for _, s in sorted(got[0])] == [
        "First sentence.", "Second one!", "Third?", "Yes.",
    ]
    assert [s for _, s in sorted(got[1])] == [
        "Dr. Smith met Mr. Jones, e.g. at noon.", "Then left.",
    ]
    assert [s for _, s in sorted(got[2])] == ["No boundary here"]
    assert [s for _, s in sorted(got[3])] == ["Trailing period."]
    assert [s for _, s in sorted(got[5])] == [
        "Fig. 3 shows etc. and i.e. usage.", "Done!",
    ]
    assert 6 not in got and 7 not in got  # empty + NULL -> no rows


def test_sentence_split_sql_twin_parity(spark):
    from chug_spark.ops.textstats import sentence_split, sentence_split_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE c (i INT, t VARCHAR)")
    for i, t in enumerate(SENT_CASES):
        con.execute("INSERT INTO c VALUES (?, ?)", [i, t])
    duck = dict(
        con.sql(f"SELECT i, {sentence_split_sql('t')} FROM c").fetchall()
    )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(SENT_CASES)], "doc_id long, text string"
    )
    got = {i: [] for i in range(len(SENT_CASES))}
    for r in sentence_split(df).collect():
        got[r.doc_id].append((r.sent_no, r.sentence))
    for i in range(len(SENT_CASES)):
        assert [s for _, s in sorted(got[i])] == duck[i], (i, SENT_CASES[i])
