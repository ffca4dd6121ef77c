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


def temperature_mix(
    docs: DataFrame,
    total: int,
    tau: float = 0.5,
    group_col: str = "source",
    seed: int = 0,
) -> DataFrame:
    """Temperature-scaled domain mixing (the LLaMA/PaLM recipe): per-domain
    sampling targets proportional to ``n_d^tau`` — tau < 1 upweights small
    domains, tau = 1 is proportional — derived IN-PLAN from the corpus
    counts, then applied as a map-only deterministic keep rule.

    Integer-exact cross-engine contract (only ``tau`` ∈ {0.5, 1.0}, the
    two values with engine-exact power functions — sqrt is correctly
    rounded IEEE in both Spark and DuckDB):

    1. one keyed agg: ``n_d`` per domain (NULL domains form their own
       group);
    2. integer micro-weights ``s_d = floor(sqrt(n_d * 10^4))`` (tau=0.5)
       or ``s_d = n_d`` (tau=1) — exact while ``n_d * 10^4 < 2^53``;
    3. largest-remainder apportionment of ``total`` over ``s_d`` (floor
       quotas + the ``total - Σfloor`` remainder seats to the largest
       ``(total*s_d) mod S``, ties → domain asc) — all int64, order-free;
    4. keep rule: 32-bit md5 draw < ``floor(target_d * 2^32 / n_d)``
       (expected kept per domain = target_d; a Bernoulli rate, not
       exact-k — exact-k would need a per-domain sort whose hottest
       domain serializes in one task).

    The apportionment windows run over the DOMAIN COUNTS relation (bounded
    by #domains, not corpus size).  Returns (doc_id, grp, n_grp, target,
    keep)."""
    from pyspark.sql.window import Window

    assert tau in (0.5, 1.0), "engine-exact powers only (sqrt / identity)"
    grp = F.coalesce(F.col(group_col).cast("string"), F.lit("\\N"))
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), grp.alias("grp")
    )
    counts = base.groupBy("grp").agg(F.count(F.lit(1)).alias("n_grp"))
    s_d = (
        F.floor(F.sqrt(F.col("n_grp") * 10000)).cast("long")
        if tau == 0.5
        else F.col("n_grp").cast("long")
    )
    tot_w = Window.partitionBy()
    quotas = counts.select(
        "grp",
        "n_grp",
        s_d.alias("sw"),  # ('s'/'S' would collide: Spark names are case-insensitive)
        F.sum(s_d).over(tot_w).alias("sw_tot"),
    ).select(
        "grp",
        "n_grp",
        # bigint `div`, never double division — floor quotas must be exact
        F.expr(f"(CAST({total} AS BIGINT) * sw) div sw_tot").alias("q"),
        ((F.lit(total) * F.col("sw")) % F.col("sw_tot")).alias("rem"),
    )
    seat_w = Window.orderBy(F.desc("rem"), F.asc("grp"))
    targets = quotas.select(
        "grp",
        "n_grp",
        (
            F.col("q")
            + (
                F.row_number().over(seat_w)
                <= F.lit(total) - F.sum("q").over(tot_w)
            ).cast("long")
        ).alias("target"),
    )
    draw = rand_below_col(F.col("doc_id"), seed, 2**32, tag="tmix")
    # bigint div again (target < 2^31 keeps target*2^32 in int64 range)
    thresh = F.least(
        F.expr("(target * 4294967296) div n_grp"), F.lit(2**32).cast("long")
    )
    return base.join(F.broadcast(targets), "grp").select(
        "doc_id",
        "grp",
        "n_grp",
        "target",
        (draw < thresh).alias("keep"),
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
