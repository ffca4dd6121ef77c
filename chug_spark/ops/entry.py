"""Driver-contract queries for the large-scale training-data ops
(deduplication, similarity search, text analysis).  Filled in as ops land."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def ops_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {}


def ops_oracle_sql() -> dict[str, str]:
    return {}
