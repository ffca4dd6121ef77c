"""Trained quality classifier (ops/classifier.py): exact integer moments,
partition invariance, numpy solve parity, planted-corpus separation, and
the hostile-row gates (NULL text, empty text, giant token)."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from chug_spark.ops.classifier import (
    FEAT_DIM,
    hashed_dims,
    moment_matrix,
    score_documents,
    solve_ridge,
    train_quality_classifier,
)

VA = ["alpha", "beta", "gamma", "delta", "epsilon"]
VB = ["omega", "sigma", "theta", "kappa", "lam"]


def _planted_rows(n=400, toks_per_doc=60):
    """Deterministic two-class corpus: class y leans 3:1 on its vocab."""
    rows = []
    for i in range(n):
        h = int(hashlib.md5(f"doc{i}".encode()).hexdigest(), 16)
        y = i % 2
        vocab = (VA * 3 + VB) if y else (VB * 3 + VA)
        toks = [vocab[(h >> (k % 13)) % len(vocab)] for k in range(toks_per_doc)]
        rows.append((i, " ".join(toks), y))
    return rows


def _dim_of(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % FEAT_DIM


def _ref_moments(rows):
    """Pure-Python reference: G = sum z z^T over z = [per-mille x, 1, y]."""
    aug = FEAT_DIM + 2
    G = np.zeros((aug, aug), dtype=np.int64)
    for _, text, y in rows:
        toks = [t for t in text.lower().split(" ") if t]
        c = np.zeros(FEAT_DIM)
        for t in toks:
            c[_dim_of(t)] += 1
        x = np.floor(c * 1000.0 / max(len(toks), 1) + 0.5)
        z = np.concatenate([x, [1.0, float(y)]]).astype(np.int64)
        G += np.outer(z, z)
    return {
        (i, j): int(G[i, j])
        for i in range(aug)
        for j in range(i, aug)
        if G[i, j]
    }


@pytest.fixture(scope="module")
def planted(spark):
    rows = _planted_rows()
    return rows, spark.createDataFrame(rows, "doc_id long, text string, y int")


def test_moments_match_pure_python_reference(planted):
    rows, docs = planted
    got = {
        (r["i"], r["j"]): r["g"]
        for r in moment_matrix(docs, F.col("y")).collect()
    }
    assert got == _ref_moments(rows)


def test_moments_partition_invariant(planted):
    _, docs = planted
    m1 = sorted(map(tuple, moment_matrix(docs.repartition(1), F.col("y")).collect()))
    m9 = sorted(map(tuple, moment_matrix(docs.repartition(9), F.col("y")).collect()))
    assert m1 == m9


def test_solve_matches_numpy(planted):
    rows, docs = planted
    mom = [(r["i"], r["j"], r["g"]) for r in moment_matrix(docs, F.col("y")).collect()]
    w = solve_ridge(mom, lam=1.0)
    aug = FEAT_DIM + 2
    G = np.zeros((aug, aug))
    for i, j, g in mom:
        G[i, j] = g
        G[j, i] = g
    A = G[: FEAT_DIM + 1, : FEAT_DIM + 1] + np.diag([1.0] * FEAT_DIM + [0.0])
    b = G[: FEAT_DIM + 1, FEAT_DIM + 1]
    wref = np.linalg.solve(A, b)
    assert np.abs(np.asarray(w) - wref).max() < 1e-6


def test_classifier_separates_planted_classes(planted):
    _, docs = planted
    w = train_quality_classifier(docs, F.col("y"), lam=1.0)
    scored = score_documents(docs, w)
    acc = (
        scored.join(docs.select("doc_id", "y"), "doc_id")
        .agg(F.avg((F.col("pred") == F.col("y")).cast("double")))
        .first()[0]
    )
    assert acc >= 0.9


def test_dead_bucket_weight_is_zero(planted):
    """Buckets no term ever hashes to must train to w=0, not blow up
    the elimination."""
    _, docs = planted
    used = {_dim_of(t) for t in VA + VB}
    w = train_quality_classifier(docs, F.col("y"), lam=1.0)
    dead = [j for j in range(FEAT_DIM) if j not in used]
    assert dead, "planted vocab unexpectedly covers every bucket"
    assert all(w[j] == 0.0 for j in dead)


def test_hostile_rows(spark):
    """NULL text drops out; empty/whitespace text contributes bias only;
    a giant single token is one feature count."""
    docs = spark.createDataFrame(
        [
            (0, None, 1),
            (1, "", 0),
            (2, "   ", 1),
            (3, "x" * 50_000, 1),
            (4, "alpha beta", 0),
        ],
        "doc_id long, text string, y int",
    )
    mom = {
        (r["i"], r["j"]): r["g"]
        for r in moment_matrix(docs, F.col("y")).collect()
    }
    bias = FEAT_DIM
    lab = FEAT_DIM + 1
    assert mom[(bias, bias)] == 4  # doc 0 excluded, 1-4 contribute bias
    assert mom[(bias, lab)] == 2  # y=1 among non-null: docs 2 and 3
    giant_dim = _dim_of("x" * 50_000)
    assert mom[(giant_dim, giant_dim)] == 1000 * 1000  # sole token -> 1000pm
    scored = {r["doc_id"]: r for r in score_documents(docs, [0.5] * 65).collect()}
    assert 0 not in scored
    assert scored[1]["score"] == 0.5  # bare bias
    assert scored[2]["score"] == 0.5


def test_scoring_uses_per_mille_scale(spark):
    """score = bias + 1000/dl * sum(w[bucket]) — doubling every token
    leaves the score unchanged (length-invariant features)."""
    base = "alpha beta gamma omega"
    docs = spark.createDataFrame(
        [(0, base), (1, " ".join([base, base]))], "doc_id long, text string"
    )
    w = [float(j % 7) for j in range(FEAT_DIM)] + [0.25]
    got = {r["doc_id"]: r["score"] for r in score_documents(docs, w).collect()}
    assert got[0] == pytest.approx(got[1])


def test_hashed_dims_matches_python_md5(spark):
    toks = ["alpha", "Zebra", "123", "x"]
    df = spark.range(1).select(
        hashed_dims(F.lit(" ".join(toks))).alias("dims")
    )
    got = df.first()["dims"]
    assert got == [_dim_of(t.lower()) for t in toks]
