"""wds-style sample ingest: flat (shard, fname, payload) member rows →
span-table documents.

The reference's tar pipeline streams members and groups *adjacent* entries by
basename prefix (``group_by_keys_nothrow``, src/chug/wds/tariterators.py:28-59,
with the non-throwing duplicate-suffix edge case :49-51).  On a table the
grouping key is global, so the Spark form is an exact groupBy — one shuffle on
the sample key — which is strictly stronger than chug's adjacency trick (a
sample split across shard boundaries groups correctly here; cf. the LAION-400m
caveat the reference works around).

Mapping of member suffixes onto span kinds:

- ``json``/``anno`` members → kind='anno'  (the annotation payload)
- text-ish members (``txt``/``text``/``caption``) → kind='text'
- everything else (``pdf``/``tif``/``png``/…) → kind='media' with the payload
  reference carried in ``media_ref``

Offsets follow (member order within the sample) = sorted (fname) — the
deterministic table analogue of tar order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import BASE_EXT_RE

TEXT_SUFFIXES = ("txt", "text", "caption")
ANNO_SUFFIXES = ("json", "anno")


def group_members(members: DataFrame) -> DataFrame:
    """(fname, payload_ref [, shard]) member rows → (doc_id, spans).

    - ``base_plus_ext`` split (tariterators.py:8-25); members whose name has
      no extension are dropped (``prefix is None: continue``, :44-45)
    - suffixes lowercased (lcase=True, :47-48)
    - ``valid_sample`` gate: samples need ≥1 payload member (:53,58)
    - duplicate suffixes within a sample are all kept as separate spans (the
      table model has no adjacency, so chug's split-sample workaround does
      not apply; documented deviation)
    """
    base = F.regexp_extract("fname", BASE_EXT_RE, 1)
    ext = F.lower(F.regexp_extract("fname", BASE_EXT_RE, 2))
    last_ext = F.regexp_replace(ext, r".*[.]", "")

    kind = (
        F.when(last_ext.isin(*ANNO_SUFFIXES), F.lit("anno"))
        .when(last_ext.isin(*TEXT_SUFFIXES), F.lit("text"))
        .otherwise(F.lit("media"))
    )
    rows = (
        members.filter(base != F.lit(""))
        .select(
            base.alias("doc_id"),
            F.col("fname"),
            kind.alias("kind"),
            F.when(kind != "media", F.col("payload_ref")).alias("text"),
            F.when(kind == "media", F.col("payload_ref")).alias("media_ref"),
        )
    )
    return (
        rows.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("fname", "kind", "text", "media_ref"))
            ).alias("sorted")
        )
        .select(
            "doc_id",
            F.transform(
                "sorted",
                lambda s, i: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    i.cast("int").alias("offset"),
                ),
            ).alias("spans"),
        )
        # valid_sample gate: at least one payload member
        .filter(F.size("spans") > 0)
    )


def dataset_size(documents: DataFrame) -> tuple[int, int]:
    """(num_samples, num_shards≈partitions) — the table analogue of
    sizes.json discovery (src/chug/wds/dataset_info.py:11-28; Iceberg makes
    this the snapshot's row-count statistic)."""
    return documents.count(), documents.rdd.getNumPartitions()


def dataset_size_df(documents: DataFrame, shard_size: int = 512) -> DataFrame:
    """:func:`dataset_size` as a one-row DataFrame with an engine-independent
    shard count (``ceil(num_samples / shard_size)`` — the planned shard fanout
    for a target samples-per-shard, the quantity sizes.json records per tar
    shard in the reference).  Distributed aggregate, no driver-side count."""
    n = F.count(F.lit(1))
    return documents.agg(
        n.alias("num_samples"),
        F.ceil(n / F.lit(float(shard_size))).cast("int").alias("num_shards"),
    )
