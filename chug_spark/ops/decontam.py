"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation set (the GPT-3 appendix-C / PaLM
contamination check).  A training-data pipeline runs this before every
release so eval numbers aren't inflated by test-set leakage.

Shape (scale notes):
- Gram generation is explode(sequence) + slice + concat_ws — regular
  codegen-friendly expressions, NOT a higher-order-function lambda
  (HOF lambdas run interpreted per element; measured ~2× slower here),
  followed by one (doc_id, gram) distinct.  Volume is linear in corpus
  tokens — the same volume every shingle-based dedup op here handles.
- The eval side is a *benchmark* — megabytes, fixed size, independent of
  corpus size.  Its distinct n-gram set is therefore bounded, and the
  gram join is a classic small-side join; we leave the strategy to AQE
  (no forced broadcast hint) so a pathologically large eval set degrades
  to a shuffle join instead of an OOM.
- One left join tags hits and one hash aggregation per doc computes both
  the gram count and the hit count.  No quadratic term anywhere.

No counterpart in the reference (extraction-focused); this is part of
the beyond-reference curation suite the engine adds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text


def gram_stream(docs: DataFrame, n: int = 5) -> DataFrame:
    """(doc_id, gram) word n-grams WITH duplicates — the codegen
    explode(sequence)+slice+concat_ws pipeline (no interpreted HOF lambdas).
    Docs shorter than n words contribute nothing."""
    words = F.split(normalize_text(F.col("text")), " ")
    return (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), words.alias("w"))
        .filter(F.size("w") >= n)
        .select(
            "doc_id",
            "w",
            F.explode(F.sequence(F.lit(0), F.size("w") - n)).alias("i"),
        )
        .select(
            "doc_id",
            F.concat_ws(" ", F.slice(F.col("w"), F.col("i") + 1, n)).alias("gram"),
        )
    )


def doc_ngrams(docs: DataFrame, n: int = 5) -> DataFrame:
    """Distinct (doc_id, gram) word n-grams of the normalized text
    (mirrors ``dedup.word_shingles``)."""
    return gram_stream(docs, n).distinct()


def eval_ngram_set(eval_docs: DataFrame, n: int = 5) -> DataFrame:
    """Distinct word n-grams of the evaluation set: one `gram` column.

    One distinct straight off the gram stream — the r5 form went through
    doc_ngrams' per-(doc_id, gram) distinct first and re-distinct'ed on
    gram, paying two aggregations for one set (r6)."""
    return gram_stream(eval_docs, n).select("gram").distinct()


def decontaminate(
    train_docs: DataFrame, eval_docs: DataFrame, n: int = 5
) -> DataFrame:
    """Per-training-doc contamination report against ``eval_docs``.

    Returns only contaminated docs: ``doc_id``, ``n_hits`` (distinct
    n-grams shared with the eval set), ``n_grams`` (distinct n-grams in
    the doc), ``hit_bp`` (hits/grams in integer basis points — exact at
    any parallelism).  Callers drop rows above a ``hit_bp`` threshold
    (GPT-3 used any-overlap at 13-grams; shorter docs want smaller n).
    """
    grams = eval_ngram_set(eval_docs, n).withColumn("hit", F.lit(1))
    report = (
        doc_ngrams(train_docs, n)
        .join(grams, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("hit").cast("int").alias("n_hits"),
            F.count(F.lit(1)).cast("int").alias("n_grams"),
        )
        .filter(F.col("n_hits") > 0)
    )
    return report.select(
        "doc_id",
        "n_hits",
        "n_grams",
        # integer div: exact and engine-identical (no float floor edge cases)
        F.expr("cast((cast(n_hits as bigint) * 10000) div n_grams as int)").alias(
            "hit_bp"
        ),
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered variant: the 100-TB shape
# ---------------------------------------------------------------------------
#
# ``decontaminate`` shuffles every distinct (doc_id, gram) pair twice (the
# global DISTINCT, then the join).  At corpus scale that shuffle IS the job.
# ``bloom_decontaminate`` produces the *identical* report with no wide gram
# shuffle at all:
#
# 1. per-doc gram dedup happens inside the row (array_distinct over the
#    doc's own gram array) — map-only, because a doc's grams all live in
#    one row anyway; n_grams falls out as size(grams) for free;
# 2. a Bloom filter built from the (bounded, benchmark-sized) eval gram
#    set is broadcast to every executor; a vectorized pandas UDF tests the
#    two xxhash64 lanes per gram and drops ~(1-fpp) of the corpus stream
#    map-side — no false negatives by construction, so recall is exact;
# 3. only the tiny candidate stream joins the real eval gram set, which
#    removes Bloom false positives — making the output value-identical to
#    the exact operator (same DuckDB oracle).
#
# The remaining shuffles are the candidate-hit aggregation and the final
# doc_id join of a tiny hits table against per-doc counts — both bounded
# by contamination volume, not corpus volume.
#
# Measured honestly (sf0.1, local[32], warm, min-of-3): exact 1.1 s,
# bloom 2.2 s — at this SF the exact op's gram shuffle is ~20 MB and
# nearly free, while the bloom path pays ~1 s of fixed cost (filter
# build + the separate in-row counts pass).  The variant earns its keep
# when the gram stream is too large to shuffle (production corpora:
# TBs of grams vs a KB-to-MB broadcast bitmap); at bench scale it is a
# correctness-identical alternative, not a speedup.


def _bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k_hashes) for a target false-positive rate."""
    import math

    n_items = max(1, n_items)
    m = max(64, int(math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, int(round(m / n_items * math.log(2))))
    return m, k


def _gram_hashes(col: str = "gram"):
    """two independent 64-bit lanes; double hashing g_i = h1 + i*h2 gives k
    probes from two hashes (Kirsch-Mitzenmacher)."""
    return (
        F.xxhash64(F.col(col)).alias("h1"),
        F.xxhash64(F.lit("lane2"), F.col(col)).alias("h2"),
    )


def build_gram_bloom(eval_docs: DataFrame, n: int = 5, fpp: float = 0.008):
    """Collect the eval set's gram hash lanes (bounded: the eval side is a
    benchmark, megabytes by assumption) and pack the Bloom bitmap on the
    driver.  Returns (bitmap bytes, m_bits, k)."""
    rows = eval_ngram_set(eval_docs, n).select(*_gram_hashes()).collect()
    m, k = _bloom_params(len(rows), fpp)
    bitmap = np.zeros((m + 7) // 8, dtype=np.uint8)
    if rows:
        h1 = np.array([r["h1"] for r in rows], dtype=np.int64)
        h2 = np.array([r["h2"] for r in rows], dtype=np.int64)
        with np.errstate(over="ignore"):
            for i in range(k):
                idx = (h1 + np.int64(i) * h2) % np.int64(m)
                np.bitwise_or.at(
                    bitmap, idx >> 3, (1 << (idx & 7)).astype(np.uint8)
                )
    return bitmap.tobytes(), m, k


def doc_gram_arrays(docs: DataFrame, n: int = 5) -> DataFrame:
    """(doc_id, grams array<string> DISTINCT) — the in-row counterpart of
    :func:`doc_ngrams`: dedup happens map-side because one doc's grams all
    live in its own row; no shuffle."""
    words = F.split(normalize_text(F.col("text")), " ")
    return (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), words.alias("w"))
        .filter(F.size("w") >= n)
        .select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - n),
                    lambda i: F.concat_ws(" ", F.slice("w", i + 1, n)),
                )
            ).alias("grams"),
        )
    )


def bloom_decontaminate(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
    fpp: float = 0.008,
) -> DataFrame:
    """Value-identical to :func:`decontaminate` (same columns, same rows),
    via broadcast-Bloom map-side prefiltering instead of a corpus-wide gram
    shuffle.  See the module comment for the scale argument."""
    bitmap_bytes, m, k = build_gram_bloom(eval_docs, n, fpp)
    sc = train_docs.sparkSession.sparkContext
    bc = sc.broadcast(bitmap_bytes)

    @F.pandas_udf("boolean")
    def bloom_maybe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        a = h1.values.astype(np.int64)
        b = h2.values.astype(np.int64)
        ok = np.ones(len(a), dtype=bool)
        with np.errstate(over="ignore"):
            for i in range(k):
                idx = (a + np.int64(i) * b) % np.int64(m)
                ok &= ((bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1) == 1
        return pd.Series(ok)

    # n_grams (per-doc DISTINCT gram count) from the in-row path: one doc's
    # grams all live in its own row, so array_distinct + size is map-only.
    counts = doc_gram_arrays(train_docs, n).select(
        "doc_id", F.size("grams").cast("int").alias("n_grams")
    )
    # the gram stream that meets the Bloom filter is the CODEGEN pipeline
    # (duplicates and all — a duplicate that fails the filter costs one
    # vectorized probe, far cheaper than in-row HOF dedup of the full
    # stream); distinct happens on the surviving sliver only.
    candidates = (
        gram_stream(train_docs, n)
        .select("doc_id", "gram", *_gram_hashes())
        .filter(bloom_maybe("h1", "h2"))
        .select("doc_id", "gram")
        .distinct()
    )
    # exact confirm join kills Bloom false positives (strategy left to AQE:
    # the eval side is bounded, so it broadcasts; a pathological eval set
    # degrades to a shuffle join instead of an OOM — same policy as the
    # exact operator)
    hits = (
        candidates.join(eval_ngram_set(eval_docs, n), "gram", "inner")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_hits"))
    )
    return hits.join(counts, "doc_id").select(
        "doc_id",
        "n_hits",
        "n_grams",
        F.expr("cast((cast(n_hits as bigint) * 10000) div n_grams as int)").alias(
            "hit_bp"
        ),
    )
