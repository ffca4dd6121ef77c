"""Document-level weighted multi-source mixing (SURVEY.md §2.7).

The reference mixes corpora by resampling *shards* with per-source weights
(``src/chug/common/config.py:181-258`` ``split_sources`` →
``source_to_shard_spec``; consumed by ResampledShardsV2).  The batch-engine
analogue operates on documents: each source contributes a deterministic
weighted subsample, and the per-source scans are combined with
``unionByName`` — one plan, no shuffle beyond the downstream consumer's own.

Determinism contract: a document's keep/drop decision is a pure function of
(doc_id, seed, source-name) via the engine-portable md5 fold
(:func:`chug_spark.functions.rand_below_col`), so the mix is identical at
any parallelism and reproducible in DuckDB SQL.  Weights are normalized by
the maximum (the heaviest source passes in full) — mirroring the reference's
*relative* sampling frequencies rather than absolute rates.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import rand_below_col

MIX_RESOLUTION = 1_000_000  # keep-rule granularity (ppm)


@dataclass
class SourceSpec:
    """Parsed per-source spec (reference common/config.py SourceSpec)."""

    url: str
    split: Optional[str] = None
    sampling_weight: Optional[float] = None
    num_samples: Optional[int] = None


def split_source_specs(
    source: str,
    split: Optional[str] = None,
    sampling_weights: Optional[Union[str, Sequence[float]]] = None,
    num_samples: Optional[Union[int, str, Sequence[int]]] = None,
) -> tuple[list[SourceSpec], Optional[int]]:
    """'::'-delimited multi-source spec → per-source SourceSpecs
    (reference ``split_sources``, common/config.py:181-223): weights and
    per-source sample counts split on the same delimiter; a scalar
    num_samples is a *total* with unknown per-source counts."""
    parts = source.split("::") if "::" in source else [source]
    n = len(parts)

    if sampling_weights is not None:
        if isinstance(sampling_weights, str):
            sampling_weights = [float(w) for w in sampling_weights.split("::")]
        assert len(sampling_weights) == n, "one weight per source"

    per_source: Optional[list[Optional[int]]] = None
    total = None
    if num_samples is not None:
        if isinstance(num_samples, str):
            num_samples = [int(s) for s in num_samples.split("::")]
        if isinstance(num_samples, int):
            total = num_samples
            per_source = [None] * n
        else:
            per_source = list(num_samples)
            total = sum(per_source)
            assert len(per_source) == n, "one sample count per source"

    specs = [
        SourceSpec(
            url=p,
            split=split,
            sampling_weight=None if sampling_weights is None else sampling_weights[i],
            num_samples=None if per_source is None else per_source[i],
        )
        for i, p in enumerate(parts)
    ]
    return specs, total


def cap_num_samples(
    df: DataFrame, num_samples: int, seed: int = 0, name: str = "", key: str = "doc_id"
) -> DataFrame:
    """Deterministic exact-count subsample: the ``num_samples`` documents
    with the smallest (md5-hash, key) — the batch analogue of the
    reference's per-source ``num_samples`` (common/config.py:200-214, used
    there for epoch sizing).

    Plan shape: ``orderBy(hash, key).limit(n)`` compiles to
    TakeOrderedAndProject — per-partition top-n then a driver merge of
    n·partitions candidates.  Exact and cheap for n up to ~10^7; beyond
    that, use :func:`weighted_union`'s rate-based keep rule instead (no
    global ordering at all)."""
    h = rand_below_col(F.col(key), seed, MIX_RESOLUTION, tag=f"cap:{name}")
    return (
        df.withColumn("_h", h)
        .orderBy("_h", key)
        .limit(num_samples)
        .drop("_h")
    )


def weighted_union(
    sources: Sequence[tuple[str, DataFrame, float]],
    seed: int = 0,
    key: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted union of span-schema scans.

    ``sources`` = (name, df, weight) triples.  Keep rule per document:
    ``md5_fold(doc_id|seed|mix:name) < (weight / max_weight) * 1e6`` — a
    Column predicate, so it pushes into each scan; the union is
    ``unionByName(allowMissingColumns=True)`` so heterogeneous extras are
    null-padded rather than rejected."""
    assert sources, "at least one source"
    max_w = max(w for _, _, w in sources)
    assert max_w > 0, "weights must have a positive maximum"
    out = None
    for name, df, w in sources:
        rate_ppm = int(round(w / max_w * MIX_RESOLUTION))
        if rate_ppm <= 0:
            continue
        if rate_ppm >= MIX_RESOLUTION:
            kept = df
        else:
            kept = df.filter(
                rand_below_col(F.col(key), seed, MIX_RESOLUTION, tag=f"mix:{name}")
                < rate_ppm
            )
        out = kept if out is None else out.unionByName(kept, allowMissingColumns=True)
    assert out is not None, "all sources had zero weight"
    return out
