"""BM25 full-text retrieval over the documents table.

The retrieval leg of the curation suite: given a small query table, score
every document with Okapi BM25 over an inverted index built in-plan and
return the top-k documents per query.  Complements the embedding-space
ANN family (ops/similarity.py) with the lexical ranking a training-data
pipeline needs for eval-set mining, seed expansion, and hard-negative
sampling (no reference counterpart — chug has no retrieval op; the
tokenization follows the same whitespace normalization as
ops/textstats.tfidf_top_terms).

Scale shape (100 TB): one explode → two keyed aggregations over the
corpus (term frequencies on (doc_id, term), document frequencies on
term — both map-side combined), a 1-row corpus-stats aggregate that
rides a broadcast cross join (never a driver collect), and a broadcast
join against the (tiny) query-term table that prunes the inverted index
to matching terms BEFORE the per-document length join.  No all-pairs
expansion anywhere; the only corpus-scale shuffles are the two index
aggregations.

Determinism contract: per-term contributions are quantized to integer
1e-4 units with ``floor(x + 0.5)`` — floor acts on the IEEE double
directly in every engine (unlike ROUND, whose decimal-string HALF_UP in
Spark can disagree with a C-library round at an exact .00005 boundary —
the lm_score lesson), and the integer SUM is order-free, so the score is
reproducible at any parallelism and hash-comparable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bm25_topk"]


def _norm(col: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents per query under Okapi BM25.

    ``docs``: (doc_id, text).  ``queries``: (query_id, query_text); query
    terms are the DISTINCT non-empty whitespace tokens of the lowercased
    query text.  NULL/empty texts contribute no terms on either side, and
    corpus statistics (N, avgdl) count only documents with at least one
    term, so degenerate rows cannot skew the length normalization.

    Returns (query_id, doc_id, score_e4, n_terms_hit, rk) with
    ``score_e4`` = BM25 score in integer 1e-4 units
    (idf = ln(1 + (N - df + 0.5)/(df + 0.5)), fully deterministic
    tie-break (score desc, doc_id asc), rk <= k.
    """
    terms = (
        docs.filter(F.col("text").isNotNull())
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.explode(F.split(_norm(F.col("text")), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    # tf already holds exactly one row per (doc, term): document frequency
    # is a re-aggregation of tf, not a second corpus-scale distinct over
    # the raw explode — the explode is consumed once.
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sum_dl")
    )
    qterms = (
        queries.filter(F.col("query_text").isNotNull())
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.explode(F.split(_norm(F.col("query_text")), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    # broadcast the query terms INTO the inverted index: the index is
    # pruned to matching terms before it ever sees the per-doc length join
    j = (
        F.broadcast(qterms)
        .join(tf, "term")
        .join(df_, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tfn = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
    )
    contrib = F.floor(idf * tfn * F.lit(10000.0) + F.lit(0.5)).cast("long")
    scored = j.groupBy("query_id", "doc_id").agg(
        F.sum(contrib).alias("score_e4"),
        F.count(F.lit(1)).cast("int").alias("n_terms_hit"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_e4"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "doc_id", "score_e4", "n_terms_hit", "rk")
    )
