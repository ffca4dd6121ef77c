"""Bucketed-table layout: co-located, shuffle-free joins at corpus scale.

At 10^12 docs the dominant recurring cost is re-shuffling the corpus on
doc_id for every join against per-doc derivatives (span stats, quality
scores, dedup verdicts, embeddings).  Spark's bucketing fixes the layout
once at write time: both sides hash-partitioned into the same number of
buckets on the same key are joined bucket-to-bucket with NO Exchange — the
save amortizes over every subsequent join/groupBy on that key.

This is the Spark analogue of the reference's shard files being the unit of
locality (wds tar shards, src/chug/wds/shardlists.py): there the shard IS
the partition; here the bucket plays that role inside the table format, and
the engine proves shuffle-freedom in the physical plan
(tests/test_bucketed.py asserts zero Exchange on a bucketed join AND on a
bucketed groupBy).

Notes for cluster deployments:

- bucket count is a layout contract: pick once per table family (both join
  sides must match; 2× mismatches still shuffle one side);
- ``sortBy`` within buckets enables sort-merge joins without the sort step;
- Iceberg's ``bucket(N, col)`` partition transform gives the same property
  via storage-partitioned joins; this module uses the built-in catalog
  bucketing so it runs anywhere (no extension jars).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: tuple[str, ...] = ("doc_id",),
    n_buckets: int = 16,
    sort_cols: tuple[str, ...] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save ``df`` as an external parquet table bucketed on ``bucket_cols``.

    ``path`` makes the table external (data outlives the catalog entry);
    ``sort_cols`` pre-sorts within each bucket so downstream sort-merge
    joins skip their sort."""
    writer = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.read.table(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key.  With matching
    bucket specs this plans as a zero-Exchange sort-merge join; the helper
    exists so callers get the catalog tables (bucket metadata lives in the
    catalog — reading the parquet paths directly would lose it and
    reintroduce the shuffle)."""
    return read_table(spark, left_table).join(read_table(spark, right_table), on, how)
