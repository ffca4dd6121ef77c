"""Iceberg-shaped documents source/sink indirection (SURVEY.md §7.0).

No Iceberg runtime jar ships in this sandbox, so the reader/writer pair is
layout-compatible parquet behind one switch: when ``table`` names a catalog
table (contains '.') it uses ``spark.read.table`` / ``writeTo`` (Iceberg
semantics: snapshot reads, overwritePartitions); otherwise it treats the
location as a parquet directory.  The rest of the engine only sees
DataFrames with the span schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_documents(spark: SparkSession, source: str) -> DataFrame:
    """Resolve any registered source spec (``scheme://locator`` or bare
    path/table) to a span-schema DataFrame via
    :mod:`chug_spark.sources.registry` — the alternate-connector invariant:
    the reference runs the identical task pipeline over wds or HF-datasets
    sources (README.md:84); here the same extraction plan runs over any
    scan that yields the span schema."""
    from .registry import read_source

    return read_source(spark, source)


def write_spans(df: DataFrame, target: str, partition_cols: tuple[str, ...] = ()) -> None:
    if "." in target and "/" not in target:
        writer = df.writeTo(target)
        if partition_cols:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_cols])
        writer.createOrReplace()
        return
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(target)
