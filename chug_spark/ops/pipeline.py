"""End-to-end corpus curation: the composed pipeline a training-data run
actually executes, built entirely from this package's operators:

    1. quality gate        — gopher_quality_filter(keep)        (map-only)
    2. exact dedup         — keep min doc_id per fingerprint    (one agg)
    3. near-dup clustering — MinHash candidates → connected
       components → keep the representative per cluster
    4. output              — surviving doc_ids

Each stage only narrows the corpus, so later (more expensive) stages see
monotonically less data — the standard curation funnel.  Everything is
deterministic and the whole composition is reproduced in DuckDB SQL
(__spark_entry__ query ``curation_keep``), so the END-TO-END funnel is
value-checked, not just its pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (
    connected_components,
    exact_dedup_keep_first,
    minhash_candidate_pairs,
)
from .textstats import gopher_quality_filter


def curate_corpus(
    docs: DataFrame,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket_size: int = 64,
) -> DataFrame:
    """Surviving doc_ids of the full curation funnel (see module docstring).

    Input: (doc_id, text[, ...]).  Output: (doc_id) — quality-passing,
    exact-unique, near-dup-representative documents."""
    base = docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text")

    # 1. quality gate (map-only; the flags never shuffle)
    quality_ids = gopher_quality_filter(base).filter(F.col("keep")).select("doc_id")
    s1 = base.join(quality_ids, "doc_id")

    # 2. exact dedup among quality survivors
    exact_ids = exact_dedup_keep_first(s1)
    s2 = s1.join(exact_ids, "doc_id")

    # 3. near-dup representatives among exact-unique survivors
    pairs = minhash_candidate_pairs(
        s2, bands=bands, shingle_n=shingle_n, max_bucket_size=max_bucket_size
    )
    # no broadcast hint: the drop set is unbounded (dup-heavy corpora), so a
    # plain shuffle anti-join; AQE broadcasts it at runtime if actually small
    cc = connected_components(pairs)
    drop = cc.filter(F.col("doc_id") != F.col("cluster")).select("doc_id")
    return s2.select("doc_id").join(drop, "doc_id", "left_anti")
