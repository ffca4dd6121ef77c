"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation set (the GPT-3 appendix-C / PaLM
contamination check).  A training-data pipeline runs this before every
release so eval numbers aren't inflated by test-set leakage.

Shape (scale notes):
- The eval side is a *benchmark* — megabytes, fixed size, independent of
  corpus size.  Its distinct n-gram set is therefore bounded, and the
  gram join is a classic small-side join; we leave the strategy to AQE
  (no forced broadcast hint) so a pathologically large eval set degrades
  to a shuffle join instead of an OOM.
- The training side explodes to one row per distinct gram per doc —
  linear in corpus tokens, the same volume every shingle-based dedup op
  here already handles.  The join is a semi-join (gram hit set), then
  one hash aggregation per doc.  No quadratic term anywhere.

No counterpart in the reference (extraction-focused); this is part of
the beyond-reference curation suite the engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text, word_shingles


def eval_ngram_set(eval_docs: DataFrame, n: int = 5) -> DataFrame:
    """Distinct word n-grams of the evaluation set: one `gram` column."""
    return (
        eval_docs.select(
            F.explode(word_shingles(normalize_text(F.col("text")), n)).alias("gram")
        )
        .distinct()
    )


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
    grams = eval_ngram_set(eval_docs, n)
    train = train_docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        word_shingles(normalize_text(F.col("text")), n).alias("shingles"),
    ).select(
        "doc_id",
        F.size("shingles").alias("n_grams"),
        F.explode("shingles").alias("gram"),
    )
    hits = (
        train.join(grams, "gram", "left_semi")
        .groupBy("doc_id", "n_grams")
        .agg(F.count(F.lit(1)).cast("int").alias("n_hits"))
    )
    return hits.select(
        "doc_id",
        "n_hits",
        F.col("n_grams").cast("int").alias("n_grams"),
        # integer div: exact and engine-identical (no float floor edge cases)
        F.expr("cast((cast(n_hits as bigint) * 10000) div n_grams as int)").alias(
            "hit_bp"
        ),
    )
