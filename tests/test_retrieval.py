"""BM25 retrieval: pure-Python parity, determinism, and edge semantics."""

import math

from pyspark.sql import functions as F

from chug_spark.ops.retrieval import bm25_topk


def _py_bm25(corpus, query_terms, k1=1.2, b=0.75):
    """Reference BM25 in plain Python over {doc_id: [terms]}."""
    dl = {d: len(ts) for d, ts in corpus.items() if ts}
    n = len(dl)
    avgdl = sum(dl.values()) / n
    df = {}
    for ts in corpus.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    scores = {}
    for d, ts in corpus.items():
        if not ts:
            continue
        s = 0
        hits = 0
        for t in set(query_terms):
            tf = ts.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            tfn = tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * dl[d] / avgdl))
            s += math.floor(idf * tfn * 10000.0 + 0.5)
            hits += 1
        if hits:
            scores[d] = (s, hits)
    return scores


def test_bm25_matches_python_reference(spark):
    texts = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "the quick brown cat sleeps",
        2: "a fox and a fox and another fox",
        3: "lazy dog lazy dog lazy dog lazy dog",
        4: "completely unrelated words here entirely",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    queries = spark.createDataFrame(
        [(0, "quick fox"), (1, "lazy dog")], "query_id long, query_text string"
    )
    out = {
        (r["query_id"], r["doc_id"]): (r["score_e4"], r["n_terms_hit"], r["rk"])
        for r in bm25_topk(docs, queries, k=5).collect()
    }
    corpus = {i: t.split() for i, t in texts.items()}
    for qid, qtext in [(0, "quick fox"), (1, "lazy dog")]:
        expect = _py_bm25(corpus, qtext.split())
        ranked = sorted(expect.items(), key=lambda kv: (-kv[1][0], kv[0]))
        for rk, (d, (s, hits)) in enumerate(ranked, start=1):
            assert out[(qid, d)] == (s, hits, rk), (qid, d)
        # nothing beyond the scoring docs
        assert sum(1 for (q, _) in out if q == qid) == len(ranked)


def test_bm25_idf_downweights_common_terms(spark):
    # 'common' appears in every doc, 'rare' in one — the rare-term doc must
    # outrank a doc that only matches the ubiquitous term.
    docs = spark.createDataFrame(
        [(i, "common filler " + ("rare" if i == 3 else "noise")) for i in range(6)],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(0, "common rare")], "query_id long, query_text string"
    )
    rows = bm25_topk(docs, queries, k=6).collect()
    top = min(rows, key=lambda r: r["rk"])
    assert top["doc_id"] == 3 and top["n_terms_hit"] == 2


def test_bm25_null_and_empty_rows_are_inert(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, None), (2, ""), (3, "   "), (4, "alpha alpha")],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(0, "alpha"), (1, None), (2, "")], "query_id long, query_text string"
    )
    rows = bm25_topk(docs, queries, k=10).collect()
    assert {r["query_id"] for r in rows} == {0}
    got = {r["doc_id"] for r in rows}
    assert got == {0, 4}
    # N counts only docs with >=1 term (0 and 4): idf = ln(1 + 0.5/2.5)
    # for a df=2 term, identical for both docs; doc 4 (tf=2, dl=2) wins.
    by_rank = sorted(rows, key=lambda r: r["rk"])
    assert [r["doc_id"] for r in by_rank] == [4, 0]


def test_bm25_deterministic_across_parallelism(spark):
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("w"), (F.col("id") % 17).cast("string"),
            F.lit(" w"), (F.col("id") % 5).cast("string"),
            F.lit(" body text token"),
        ).alias("text"),
    )
    queries = spark.createDataFrame(
        [(0, "w3 token"), (1, "w11 w1")], "query_id long, query_text string"
    )
    a = sorted(map(tuple, bm25_topk(docs.repartition(1), queries, k=7).collect()))
    b = sorted(map(tuple, bm25_topk(docs.repartition(13), queries, k=7).collect()))
    assert a == b and len(a) == 14
