"""Exact quantile binning over a bounded integer score domain — the
corpus-stratification step (quality deciles, perplexity buckets) that
curation pipelines run before sampling/mixing.

The scalable contract: **value-contiguous quantile bins, ties never
split**.  Rank-based ``ntile`` needs a global sort and splits equal scores
arbitrarily across bins (non-deterministic at scale); instead we bin by
exact value thresholds computed from the score *histogram*:

1. one keyed aggregation builds the histogram — bounded by the score
   domain (basis points → ≤ ~10k distinct values), NOT corpus size, so the
   downstream windows touch a tiny relation no matter how many rows feed
   them;
2. thresholds ``t_k = min{v : cum_count(v) * n_bins >= k * N}`` for
   ``k = 1..n_bins-1`` (the integer-exact form of ``cum >= ceil(kN/B)`` —
   no float division, so Spark and the DuckDB oracle agree bit-for-bit);
3. the thresholds collapse to ONE array row, broadcast-cross-joined back,
   and the bin assignment is a map-only array filter:
   ``bin(v) = 1 + #{k : v > t_k}``.

Cost at 100 TB: one shuffle (the histogram partial agg), one broadcast of
a ≤(n_bins-1)-element array, two map-only scans.  Heavy ties can leave a
bin empty — that is the documented semantics, not a bug (the alternative
is splitting a tie, which no longer commutes with repartitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def value_quantile_thresholds(
    scored: DataFrame, col: str, n_bins: int
) -> DataFrame:
    """One-row DataFrame with ``ts``: the sorted (n_bins-1)-element exact
    threshold array for ``col`` over ``scored`` (NULL scores excluded).
    The windows run over the *histogram* (bounded by the value domain)."""
    hist = (
        scored.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cum_w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
    tot_w = Window.partitionBy()
    cum = hist.select(
        F.col(col).alias("v"),
        F.sum("c").over(cum_w).alias("cc"),
        F.sum("c").over(tot_w).alias("n"),
    )
    ks = F.explode(F.sequence(F.lit(1), F.lit(n_bins - 1))).alias("k")
    th = (
        cum.select("v", "cc", "n", ks)
        # cc >= ceil(k*N/B)  <=>  cc*B >= k*N  (positive integers)
        .filter(F.col("cc") * n_bins >= F.col("k") * F.col("n"))
        .groupBy("k")
        .agg(F.min("v").alias("t"))
    )
    return th.agg(F.sort_array(F.collect_list("t")).alias("ts"))


def assign_quantile_bins(
    scored: DataFrame, col: str, n_bins: int = 10
) -> DataFrame:
    """``scored`` + an exact value-quantile ``bin`` column (1..n_bins) for
    integer score column ``col``; NULL-score rows are dropped (unscoreable
    rows can't sit in a quantile).  bin(v) = 1 + #{k : v > t_k}."""
    ts = value_quantile_thresholds(scored, col, n_bins)
    return (
        scored.filter(F.col(col).isNotNull())
        .crossJoin(F.broadcast(ts))
        .select(
            *scored.columns,
            (
                1
                + F.size(F.filter("ts", lambda t: F.col(col) > t))
            ).cast("int").alias("bin"),
        )
    )


def quality_quantile_bins(docs: DataFrame, n_bins: int = 10) -> DataFrame:
    """(doc_id, quality_bp, bin): documents stratified into exact quality
    quantile bins (see module docstring for the tie/threshold contract)."""
    from .textstats import quality_score

    scored = quality_score(docs).select("doc_id", "quality_bp")
    return assign_quantile_bins(scored, "quality_bp", n_bins)
