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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text


def doc_ngrams(docs: DataFrame, n: int = 5) -> DataFrame:
    """Distinct (doc_id, gram) word n-grams of the normalized text.
    Docs shorter than n words contribute nothing (mirrors
    ``dedup.word_shingles``)."""
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
        .distinct()
    )


def eval_ngram_set(eval_docs: DataFrame, n: int = 5) -> DataFrame:
    """Distinct word n-grams of the evaluation set: one `gram` column."""
    return doc_ngrams(eval_docs, n).select("gram").distinct()


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
