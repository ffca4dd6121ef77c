"""Optional HF ``datasets`` connector — the ``hf://`` source scheme.

Mirrors the reference loader's streaming path (src/chug/hfds/loader.py:95-123):
``load_dataset(source, data_dir=..., streaming=True)`` → split select →
decode-disabled cast for Image/Audio features (loader.py:14-29) → iterate.
The ``datasets`` library is not installed in this sandbox, so the connector
is an *optional-import* shim: the scheme is always registered, the reader
raises a clear ImportError when the library is absent, and every piece of
dispatch logic (locator parsing, split selection, decode-disable cast, row
batching) accepts an injected module so tests exercise it with a fake.

Locator grammar: ``hf://<dataset_name>[#<split>][?limit=N]`` — e.g.
``hf://naver-clova-ix/cord-v2#validation?limit=500``.  ``limit`` bounds how
many streamed samples are pulled (streaming datasets are unbounded
iterators; a Spark batch source needs a finite scan).
"""

from __future__ import annotations

import importlib.util
import itertools
from copy import deepcopy

from pyspark.sql import DataFrame, SparkSession

from .registry import register_source

#: rows pulled per createDataFrame batch — bounds driver memory while
#: streaming an HF dataset into Spark.
_BATCH_ROWS = 10_000


def parse_hf_locator(locator: str) -> tuple[str, str, int | None]:
    """``name[#split][?limit=N]`` → (name, split, limit)."""
    limit = None
    if "?" in locator:
        locator, qs = locator.split("?", 1)
        for part in qs.split("&"):
            k, _, v = part.partition("=")
            if k == "limit":
                limit = int(v)
            else:
                raise ValueError(f"unknown hf:// query param {k!r}")
    split = "train"
    if "#" in locator:
        locator, split = locator.rsplit("#", 1)
    return locator, split, limit


def disable_decode(ds, datasets_mod):
    """Cast Image/Audio features to decode=False so samples carry raw bytes
    (reference ``_disable_decode``, hfds/loader.py:14-29) — decoding happens
    in the engine's own vectorized UDFs, not in the loader."""
    to_set = []
    for k, v in getattr(ds, "features", {}).items():
        if isinstance(v, (datasets_mod.Image, datasets_mod.Audio)):
            d = deepcopy(v)
            d.decode = False
            to_set.append((k, d))
    for k, d in to_set:
        ds = ds.cast_column(k, d)
    return ds


def iter_hf_rows(name: str, split: str, limit: int | None, datasets_mod):
    """Streamed sample iterator: load → split → decode-disable → bound."""
    ds = datasets_mod.load_dataset(name, streaming=True)
    if split not in ds:
        raise KeyError(f"split {split!r} not in dataset ({sorted(ds)})")
    ds = disable_decode(ds[split], datasets_mod)
    it = iter(ds)
    if limit is not None:
        it = itertools.islice(it, limit)
    return it


def hf_to_dataframe(
    spark: SparkSession,
    locator: str,
    datasets_mod=None,
) -> DataFrame:
    """Materialize an HF dataset split as a Spark DataFrame.

    Rows stream driver-side in bounded batches (``_BATCH_ROWS``) and union
    into one DataFrame; schema is inferred from the first batch and enforced
    on the rest.  For very large splits prefer downloading the dataset's
    parquet shards and reading them with the ``parquet`` scheme — this
    connector is the *convenience* path that matches the reference loader's
    streaming iteration, not a bulk-transfer path.
    """
    if datasets_mod is None:
        if importlib.util.find_spec("datasets") is None:
            raise ImportError(
                "the 'datasets' library is required for hf:// sources; "
                "pip install datasets, or read the dataset's parquet export "
                "via the parquet:// scheme"
            )
        import datasets as datasets_mod  # type: ignore[no-redef]

    name, split, limit = parse_hf_locator(locator)
    it = iter_hf_rows(name, split, limit, datasets_mod)

    # ONE createDataFrame over the accumulated rows: chaining a unionByName
    # per batch builds a plan thousands of LocalRelations deep for a large
    # un-limited split (driver planning/memory blowup before any action).
    # The rows are driver-resident either way; the schema is still inferred
    # from the first batch alone and enforced on the rest.
    schema = None
    rows: list = []
    while True:
        batch = list(itertools.islice(it, _BATCH_ROWS))
        if not batch:
            break
        if schema is None:
            schema = spark.createDataFrame(batch).schema
        rows.extend(batch)
    if schema is None:
        raise ValueError(f"hf dataset {name!r} split {split!r} yielded no rows")
    return spark.createDataFrame(rows, schema)


@register_source("hf")
def _read_hf(spark: SparkSession, locator: str) -> DataFrame:
    return hf_to_dataframe(spark, locator)
