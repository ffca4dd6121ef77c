"""chug_spark — a from-scratch PySpark-native reimplementation of the
huggingface/chug sharded multi-modal document decode pipeline as a batch
extraction engine over Iceberg-shaped span tables.

Reference: /root/reference (huggingface/chug, Apache-2.0).  This package
re-expresses the reference's *semantics* (wds-style sample grouping, PDF/image
page decoding, OCR-annotation parsing, text assembly, tokenization) Spark-first:
DataFrame plans optimized by Catalyst, with vectorized pandas/Arrow UDFs only
where decode logic is genuinely imperative.
"""

from .config import (
    ExtractJobCfg,
    FeatureInfo,
    ImageFeatureInfo,
    ImageTextTaskCfg,
    VqaTaskCfg,
)
from .extract import extract_docread, flatten_spans, run_extract
from .schema import DOCUMENTS_SCHEMA, FLAT_SPANS_SCHEMA, SPAN_STRUCT
from .sources.documents import read_documents, write_spans
from .sources.mixing import cap_num_samples, split_source_specs, weighted_union
from .sources.registry import read_source, register_mem_dataset, register_source
from .sources import hf as _hf_source  # noqa: F401  (registers the hf:// scheme)

__version__ = "0.2.0"

__all__ = [
    "ExtractJobCfg",
    "FeatureInfo",
    "ImageFeatureInfo",
    "ImageTextTaskCfg",
    "VqaTaskCfg",
    "extract_docread",
    "flatten_spans",
    "run_extract",
    "DOCUMENTS_SCHEMA",
    "FLAT_SPANS_SCHEMA",
    "SPAN_STRUCT",
    "read_documents",
    "write_spans",
    "read_source",
    "register_source",
    "register_mem_dataset",
    "split_source_specs",
    "weighted_union",
    "cap_num_samples",
]
