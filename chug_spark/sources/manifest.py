"""Shard-manifest construction and sampling — the Spark analogue of chug's
shard-list machinery (SURVEY.md §2.1 S1-S4).

In the Iceberg-shaped engine, shard enumeration is the catalog's job; these
utilities cover the wds-compatible surface: brace-expanded url lists with
``::``-concatenated weighted sources and ``${VAR}`` env substitution
(reference src/chug/common/urls.py:10-88), deterministic per-epoch shard
shuffling (src/chug/wds/shardlists.py:10-59), and weighted resampling with
replacement (:62-119) — all schedule-independent (hash-ordered / inverse-CDF
on hash-derived uniforms instead of stateful RNG streams).
"""

from __future__ import annotations

import itertools
import os
import re
from numbers import Number
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ENV_RE = re.compile(r"\$\{(\w+)\}")
_BRACE_RE = re.compile(r"\{([^{}]*)\}")


def _envlookup(m: re.Match) -> str:
    """WDS_/CHUG_-prefixed env lookup (reference common/urls.py:10-24)."""
    key = m.group(1)
    for prefix in ("WDS_", "CHUG_"):
        if prefix + key in os.environ:
            return os.environ[prefix + key]
    raise KeyError(f"missing WDS/CHUG environment variable for {key}")


def envsubst(s: str) -> str:
    return _ENV_RE.sub(_envlookup, s)


def braceexpand(s: str) -> list[str]:
    """Bash-style brace expansion: numeric ranges ``{0000..0099}`` (width
    preserved) and comma alternation ``{a,b,c}``; nested/multiple groups
    expand as a cross product (the subset the reference's shard specs use,
    e.g. README.md:145 ``pdfa-eng-train-{000000..005000}.tar``)."""
    m = _BRACE_RE.search(s)
    if not m:
        return [s]
    body = m.group(1)
    pre, post = s[: m.start()], s[m.end():]
    rng = re.fullmatch(r"(\d+)\.\.(\d+)", body)
    if rng:
        a, b = rng.group(1), rng.group(2)
        width = len(a) if a.startswith("0") or len(a) == len(b) else 0
        items = [str(i).zfill(width) for i in range(int(a), int(b) + 1)]
    elif "," in body:
        items = body.split(",")
    else:
        items = [body]
    return [x for item in items for x in braceexpand(pre + item + post)]


def expand_urls(
    urls: str | Sequence[str], weights: Optional[str | float | Sequence[float]] = None
) -> tuple[list[str], Optional[list[float]]]:
    """``::``-concatenation + env substitution + brace expansion, with
    per-source weights fanned out across each source's expansion
    (reference src/chug/common/urls.py:48-88)."""
    if weights is None:
        if isinstance(urls, str):
            out: list[str] = []
            for part in urls.split("::"):
                prev = None
                for _ in range(10):  # iterate substitution (urls.py:40-45)
                    if part == prev:
                        break
                    prev, part = part, envsubst(part)
                out.extend(braceexpand(part))
            return out, None
        return list(urls), None

    if isinstance(urls, str):
        url_list = urls.split("::")
        if isinstance(weights, str):
            weights = [float(w) for w in weights.split("::")]
        elif isinstance(weights, Number):
            weights = [float(weights)] * len(url_list)
        assert len(weights) == len(url_list), (
            f"Expected the number of data components ({len(url_list)}) and "
            f"weights({len(weights)}) to match."
        )
        all_urls, all_weights = [], []
        for url, weight in zip(url_list, weights):
            expanded = braceexpand(envsubst(url))
            all_urls.extend(expanded)
            all_weights.extend([float(weight)] * len(expanded))
        return all_urls, all_weights

    all_urls = list(urls)
    if isinstance(weights, Number):
        return all_urls, [float(weights)] * len(all_urls)
    assert len(list(weights)) == len(all_urls)
    return all_urls, [float(w) for w in weights]


def shard_manifest(
    spark: SparkSession,
    urls: str | Sequence[str],
    weights=None,
) -> DataFrame:
    """Expanded (shard_url, weight) manifest DataFrame — the ShardSpec
    analogue (reference common/types.py:78-91)."""
    u, w = expand_urls(urls, weights)
    rows = list(zip(u, w if w is not None else itertools.repeat(1.0)))
    return spark.createDataFrame(rows, "shard_url string, weight double")


def shuffled_shards(manifest: DataFrame, seed: int = 0, interval: int = 0,
                    num_sub_intervals: Optional[int] = None,
                    keep_order_col: bool = False) -> DataFrame:
    """Deterministic per-epoch shard order: sort by md5(url | seed+interval)
    (replaces ShuffledShardList's seeded Fisher-Yates, shardlists.py:44-51 —
    uniform order, schedule-independent).  ``num_sub_intervals`` stripes the
    list across sub-epochs (shardlists.py:53-55).  ``keep_order_col=True``
    retains the ``shard_order`` sort key so consumers (and oracles) can
    rank by the op's OWN ordering instead of re-deriving the eff-seed
    rule."""
    if num_sub_intervals is None:
        eff_seed = seed + interval
        out = manifest
    else:
        eff_seed = seed + interval // num_sub_intervals
        out = manifest.withColumn(
            "_stripe",
            F.pmod(
                F.conv(F.substring(F.md5(F.concat_ws("|", F.col("shard_url"),
                       F.lit(str(eff_seed)))), 1, 8), 16, 10).cast("long"),
                F.lit(num_sub_intervals),
            ),
        ).filter(F.col("_stripe") == interval % num_sub_intervals).drop("_stripe")
    order = F.md5(F.concat_ws("|", F.col("shard_url"), F.lit(str(eff_seed))))
    out = out.withColumn("shard_order", order).orderBy("shard_order")
    return out if keep_order_col else out.drop("shard_order")


def resampled_shards(manifest: DataFrame, nshards: int, seed: int = 0,
                     interval: int = 0) -> DataFrame:
    """Weighted sampling WITH replacement, ``nshards`` draws (ResampledShardsV2,
    shardlists.py:62-119): inverse-CDF over the cumulative weight using
    md5-derived uniforms per draw — deterministic at any parallelism.
    Returns (draw, shard_url)."""
    from pyspark.sql import Window

    spark = manifest.sparkSession
    w_cum = Window.orderBy("shard_url").rowsBetween(Window.unboundedPreceding, 0)
    cdf = (
        manifest.withColumn("cum", F.sum("weight").over(w_cum))
        .withColumn("total", F.sum("weight").over(Window.partitionBy()))
        .select("shard_url", (F.col("cum") / F.col("total")).alias("cdf"),
                F.col("cum"), F.col("total"))
    )
    draws = spark.range(nshards).select(
        F.col("id").cast("int").alias("draw"),
        (
            F.conv(F.substring(F.md5(F.concat_ws("|", F.lit("draw"),
                F.col("id").cast("string"), F.lit(str(seed + interval)))), 1, 12), 16, 10)
            .cast("double") / F.lit(float(16 ** 12))
        ).alias("u"),
    )
    # inverse CDF: smallest shard with cdf > u  (range join; shard list is a
    # small broadcast dimension at any scale)
    joined = draws.join(F.broadcast(cdf), F.col("cdf") > F.col("u"))
    from pyspark.sql import Window as W

    pick = W.partitionBy("draw").orderBy("cdf")
    return (
        joined.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select("draw", "shard_url")
    )
