"""Deduplication operators for large-scale corpus curation.

Not present in the reference (chug streams training data; curation happens
upstream) — these are the ops a 10^12-doc extraction pipeline needs next to
the decoder, built Spark-first:

- exact dedup: hash-groupBy (map-side partial agg, one shuffle on the hash)
- MinHash+LSH: per-band signatures computed with higher-order functions (no
  explode, no UDF), candidate pairs via self-join on (band, signature) —
  the join key is the LSH bucket so the shuffle is tiny vs all-pairs
- SimHash: 16-bit signature from per-hex-position majority vote
- n-gram Jaccard: shingle-explode + equi-join + ratio; exact verification
  for candidate pairs

All hashes are md5-based so DuckDB oracles compute identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_text(col):
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """Groups of exact duplicates (normalized text): fingerprint, group size,
    representative = min doc_id.  One hash-partitioned aggregation; partial
    aggregation makes this shuffle-light at any scale."""
    return (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.md5(normalize_text(F.col("text"))).alias("fingerprint"),
        )
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("representative"),
        )
        .filter(F.col("n_docs") > 1)
    )


def exact_dedup_keep_first(docs: DataFrame) -> DataFrame:
    """Deduplicated doc_ids (keep min doc_id per fingerprint)."""
    return (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.md5(normalize_text(F.col("text"))).alias("fingerprint"),
        )
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )


def word_shingles(col, n: int = 3):
    """Distinct word n-gram shingles of a text column (higher-order fns).
    Documents shorter than n words yield an empty set."""
    words = F.split(col, " ")
    return F.when(
        F.size(words) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(words) - n),
                lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_signatures(docs: DataFrame, bands: int = 8, shingle_n: int = 3) -> DataFrame:
    """Per-doc MinHash LSH signatures: for band b, sig = min over shingles of
    md5(b || '|' || shingle).  One row per (doc, band); no explode of the
    shingle set — array_min(transform(...)) per band, zero shuffle before the
    bucket join.  (Measured faster than the explode→groupBy(min) formulation
    at sf0.1: the per-band HOF pass avoids the doc_id shuffle entirely.)"""
    sh = word_shingles(F.col("text"), shingle_n)
    docs = docs.select(F.col("doc_id").cast("long").alias("doc_id"), sh.alias("sh"))
    band_sigs = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.array_min(
            F.transform(
                F.col("sh"),
                lambda s: F.md5(F.concat(b.cast("string"), F.lit("|"), s)),
            )
        ),
    )
    return (
        docs.filter(F.size("sh") > 0)
        .select("doc_id", F.posexplode(band_sigs).alias("band", "sig"))
    )


def minhash_candidate_pairs(docs: DataFrame, bands: int = 8, shingle_n: int = 3) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any (band, signature) bucket.
    The self-join shuffles on the bucket key (band, sig) — pairs only form
    inside buckets, which is the whole point of LSH at 10^12 docs."""
    sigs = minhash_signatures(docs, bands, shingle_n)
    a = sigs.alias("a")
    b = sigs.alias("b")
    return (
        a.join(b, on=["band", "sig"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """16-bit SimHash over words: bit i = majority of (hex digit i of
    md5(word) >= 8).  Returns (doc_id, simhash bitstring)."""
    words = F.split(F.col("text"), " ")
    bits = F.transform(
        F.sequence(F.lit(1), F.lit(16)),
        lambda i: F.when(
            F.size(
                F.filter(
                    words,
                    lambda w: F.conv(F.substring(F.md5(w), i, 1), 16, 10).cast("int") >= 8,
                )
            )
            * 2
            > F.size(words),
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.array_join(bits, "").alias("simhash"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame, shingle_n: int = 3, threshold: float = 0.2
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs found by shingle equi-join:
    explode distinct shingles → self-join on shingle → count intersections →
    |A∩B| / (|A|+|B|-|A∩B|).  Integer-ratio math — bit-identical in any
    engine.  Shuffle key = shingle (high cardinality, well distributed)."""
    sh = word_shingles(F.col("text"), shingle_n)
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), sh.alias("sh")
    ).filter(F.size("sh") > 0)
    sizes = base.select("doc_id", F.size("sh").alias("n_sh"))
    exploded = base.select("doc_id", F.explode("sh").alias("shingle"))
    inter = (
        exploded.alias("a")
        .join(exploded.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_sh", "n_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("n_sh", "n_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
