"""DSIR importance resampling (ops/dsir.py): pure-Python score parity,
target enrichment, partition invariance, bigram edge cases, hostile rows."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from chug_spark.ops.dsir import DSIR_DIM, doc_gram_counts, dsir_scores, dsir_topk


def _bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % DSIR_DIM


def _ref_scores(rows):
    """Pure-Python replica: hashed uni+bigram counts, add-one smoothed
    log-ratio in integer micro-nats, integer per-doc sums."""
    percounts, t_c, r_c = {}, [0] * DSIR_DIM, [0] * DSIR_DIM
    for doc_id, text, is_t in rows:
        if text is None:
            continue
        toks = [t for t in " ".join(text.lower().split()).split(" ") if t]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if not grams:
            continue
        c = {}
        for g in grams:
            c[_bucket(g)] = c.get(_bucket(g), 0) + 1
        percounts[doc_id] = c
        for b, n in c.items():
            r_c[b] += n
            if is_t:
                t_c[b] += n
    T, R = sum(t_c), sum(r_c)
    ratio = [
        math.floor(
            (
                math.log((t_c[b] + 1) / float(T + DSIR_DIM))
                - math.log((r_c[b] + 1) / float(R + DSIR_DIM))
            )
            * 1e6
            + 0.5
        )
        for b in range(DSIR_DIM)
    ]
    return {
        d: sum(n * ratio[b] for b, n in c.items()) for d, c in percounts.items()
    }


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(120):
        h = int(hashlib.md5(f"d{i}".encode()).hexdigest(), 16)
        is_t = 1 if i % 3 == 0 else 0
        vocab = (
            ["clean", "prose", "article", "essay"]
            if is_t
            else ["spam", "casino", "click", "win", "clean"]
        )
        toks = [vocab[(h >> (k % 11)) % len(vocab)] for k in range(40)]
        rows.append((i, " ".join(toks), is_t))
    rows += [(900, None, 0), (901, "", 0), (902, "solo", 1)]
    return rows, spark.createDataFrame(rows, "doc_id long, text string, is_t int")


def test_scores_match_pure_python(corpus):
    rows, docs = corpus
    got = {
        r["doc_id"]: r["score_e6"]
        for r in dsir_scores(docs, F.col("is_t")).collect()
    }
    assert got == _ref_scores(rows)


def test_selection_enriches_target(corpus):
    _, docs = corpus
    top = dsir_topk(docs, F.col("is_t"), k=30)
    sel = top.join(docs.select("doc_id", "is_t"), "doc_id")
    frac = sel.agg(F.avg(F.col("is_t").cast("double"))).first()[0]
    base = docs.agg(F.avg(F.col("is_t").cast("double"))).first()[0]
    assert frac > base + 0.2


def test_partition_invariant(corpus):
    _, docs = corpus
    a = [tuple(r) for r in dsir_topk(docs.repartition(1), F.col("is_t"), k=25).collect()]
    b = [tuple(r) for r in dsir_topk(docs.repartition(13), F.col("is_t"), k=25).collect()]
    assert a == b and len(a) == 25


def test_single_token_doc_has_no_bigrams(corpus):
    _, docs = corpus
    gc = doc_gram_counts(docs.filter(F.col("doc_id") == 902), F.col("is_t"))
    got = gc.collect()
    # exactly the one unigram bucket, count 1 (no descending-sequence
    # bigram artifacts)
    assert len(got) == 1
    assert got[0]["bucket"] == _bucket("solo") and got[0]["c"] == 1


def test_null_and_empty_docs_drop_out(corpus):
    _, docs = corpus
    scored = dsir_scores(docs, F.col("is_t"))
    ids = {r["doc_id"] for r in scored.select("doc_id").collect()}
    assert 900 not in ids and 901 not in ids and 902 in ids


def test_sampled_ranking_differs_but_is_deterministic(corpus):
    _, docs = corpus
    det = [r["doc_id"] for r in dsir_topk(docs, F.col("is_t"), k=25).collect()]
    s1 = [r["doc_id"] for r in dsir_topk(docs, F.col("is_t"), k=25, sampled=True).collect()]
    s2 = [r["doc_id"] for r in dsir_topk(docs, F.col("is_t"), k=25, sampled=True).collect()]
    assert s1 == s2
    assert s1 != det  # Gumbel noise reorders at least something


def test_topk_plan_uses_take_ordered(corpus):
    _, docs = corpus
    plan = (
        dsir_topk(docs, F.col("is_t"), k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
