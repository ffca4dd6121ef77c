"""Pluggable document-source registry (SURVEY.md §2.1 S9).

The reference runs the *identical* task pipeline over interchangeable
loaders — wds tar shards or HF datasets (``src/chug/hfds/loader.py:32-189``,
wrapping via the builder in ``README.md:84``).  The Spark analogue: any
callable ``(spark, locator) -> DataFrame`` producing the span schema can
register under a scheme; the extraction plan never knows which scan feeds
it.

Built-in schemes:

- ``parquet://<path>``  (also the default for bare paths)
- ``jsonl://<path>``    JSON-lines files with the span schema
- ``table://<name>``    catalog table (Iceberg semantics when a catalog jar
  is present; bare dotted names also route here)
- ``html://<path>``     raw web pages (doc_id, html) -> docread samples
  (text blocks as annotation pages, <img> targets as page images)
- ``mem://<name>``      an in-memory dataset registered with
  :func:`register_mem_dataset` — the stand-in for the HF-datasets connector
  (the ``datasets`` library is absent in this sandbox): rows are
  already-grouped samples, exactly the shape ``hfds/loader.py`` yields
  after its feature mapping.  A live HF connector drops into this slot with
  ``register_source("hf")`` and ~10 lines of ``datasets.load_dataset`` +
  ``spark.createDataFrame``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_READERS: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_MEM_DATASETS: dict[str, list] = {}


def register_source(scheme: str):
    """Decorator: register a reader callable for ``scheme://locator`` specs."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _READERS[scheme] = fn
        return fn

    return deco


def registered_schemes() -> list[str]:
    return sorted(_READERS)


def read_source(spark: SparkSession, spec: str) -> DataFrame:
    """Resolve ``spec`` to a DataFrame via the registry.

    ``scheme://locator`` dispatches on scheme; bare specs fall back to the
    legacy rules (.jsonl/.json suffix → jsonl, dotted name without '/' →
    catalog table, else parquet path).
    """
    if spec.startswith("pipe:"):
        # reference syntax has no '//' (README.md:145: 'pipe:curl -s ...')
        return _READERS["pipe"](spark, spec[len("pipe:"):])
    if "://" in spec:
        scheme, locator = spec.split("://", 1)
        if scheme not in _READERS:
            raise ValueError(
                f"unknown source scheme {scheme!r}; registered: {registered_schemes()}"
            )
        return _READERS[scheme](spark, locator)
    if spec.endswith((".jsonl", ".json")) or spec.rstrip("/").endswith("_jsonl"):
        return _READERS["jsonl"](spark, spec)
    if "." in spec and "/" not in spec:
        return _READERS["table"](spark, spec)
    return _READERS["parquet"](spark, spec)


@register_source("parquet")
def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


@register_source("jsonl")
def _read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    from ..schema import DOCUMENTS_SCHEMA

    return spark.read.schema(DOCUMENTS_SCHEMA).json(path)


@register_source("table")
def _read_table(spark: SparkSession, name: str) -> DataFrame:
    return spark.read.table(name)


@register_source("html")
def _read_html(spark: SparkSession, locator: str) -> DataFrame:
    """``html://<path>``: parquet (or .jsonl) files of raw web pages with
    columns ``(doc_id, html)``, converted map-side into docread samples
    via :func:`chug_spark.ops.html.html_to_docread_samples` — kept text
    blocks become the annotation's pages, ``<img src>`` targets become
    page-image media spans, so page-sampling policies and error lineage
    apply to web pages exactly as to wds shards.  Makes raw HTML a
    first-class job input: ``spark-submit chug_spark/job.py --input
    'html://pages/*.parquet'``."""
    from pyspark.sql import types as T

    from ..ops.html import html_to_docread_samples

    if locator.endswith((".jsonl", ".json")):
        schema = T.StructType(
            [
                T.StructField("doc_id", T.StringType()),
                T.StructField("html", T.StringType()),
            ]
        )
        raw = spark.read.schema(schema).json(locator)
    else:
        raw = spark.read.parquet(locator)
    return html_to_docread_samples(raw)


@register_source("mem")
def _read_mem(spark: SparkSession, name: str) -> DataFrame:
    from ..schema import DOCUMENTS_SCHEMA

    if name not in _MEM_DATASETS:
        raise KeyError(
            f"mem dataset {name!r} not registered; known: {sorted(_MEM_DATASETS)}"
        )
    return spark.createDataFrame(_MEM_DATASETS[name], DOCUMENTS_SCHEMA)


def register_mem_dataset(name: str, rows: list) -> None:
    """Register an in-memory dataset of (doc_id, spans) rows (tuples or
    dicts) — the HF-datasets-shaped source for tests and small fixtures."""
    _MEM_DATASETS[name] = rows
