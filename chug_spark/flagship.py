"""Flagship query wiring: doc-read extraction over the span table derived
deterministically from the driver's flat documents.parquet (see
synth.spans_from_documents for the construction contract)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .config import ExtractJobCfg
from .extract import extract_docread_flat
from .synth import spans_from_documents


def docread_flat(
    spark: SparkSession, sf_dir: str, page_sampling: str = "all_valid", seed: int = 0
) -> DataFrame:
    """Derived span corpus → doc-read extraction → flat span rows
    (doc_id, offset, kind, text, media_ref).  Uses the flat assembly path
    (extract_docread_flat): value-identical to the nested pipeline but with
    no per-doc array build/sort — codegen end-to-end on passthrough docs."""
    docs = spans_from_documents(spark, sf_dir)
    cfg = ExtractJobCfg(page_sampling=page_sampling, seed=seed)
    flat, _errors = extract_docread_flat(spark, docs, cfg)
    return flat
