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
from .sources import pipe as _pipe_source  # noqa: F401  (registers pipe: specs)
from .checkpoint import read_output, write_with_checkpoint
from .ops.dataflow import salted_join, sample_exact_k, split_assign, stratified_sample
from .ops.dedup import (
    connected_components,
    exact_substring_dedup_cut,
    exact_substring_spans,
    connected_components_star,
    dedup_keep_representative,
    exact_dedup_groups,
    minhash_candidate_pairs,
    minhash_jaccard_verified,
    ngram_jaccard_pairs,
    simhash_hamming_pairs,
    snapshot_dedup,
    snapshot_diff,
)
from .ops.decontam import decontaminate
from .ops.events import asof_attach_last_mark, sessionize, sessionize_presplit
from .ops.packing import budget_select, pack_sequences
from .ops.html import html_main_content
from .ops.media_features import media_dhash, media_near_dupes
from .sources.pipe import read_pipe_samples
from .sources.tar import read_tar_samples
from .ops.similarity import (
    ann_recall_at_k,
    quantize_embeddings_int8,
    cosine_pairs_threshold,
    ivf_topk,
    kmeans_centroids,
    knn_topk_exact,
    semantic_pairs,
)
from .ops.textstats import (
    boilerplate_block_dedup,
    gopher_quality_filter,
    pii_scrub,
    quality_score,
    token_count,
    vocab_topk,
)
from .sources.bucketed import cobucketed_join, write_bucketed
from .streaming.windows import session_counts, sliding_counts, tumbling_counts

__version__ = "0.3.0"

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
    # checkpoint / resume
    "write_with_checkpoint",
    "read_output",
    # curation: dedup
    "exact_dedup_groups",
    "minhash_candidate_pairs",
    "minhash_jaccard_verified",
    "simhash_hamming_pairs",
    "ngram_jaccard_pairs",
    "exact_substring_spans",
    "exact_substring_dedup_cut",
    "connected_components",
    "connected_components_star",
    "dedup_keep_representative",
    "boilerplate_block_dedup",
    "snapshot_dedup",
    # curation: similarity
    "cosine_pairs_threshold",
    "knn_topk_exact",
    "ann_recall_at_k",
    "ivf_topk",
    "kmeans_centroids",
    "semantic_pairs",
    "quantize_embeddings_int8",
    # curation: decontamination / packing
    "decontaminate",
    "pack_sequences",
    # curation: text stats
    "token_count",
    "quality_score",
    "gopher_quality_filter",
    "pii_scrub",
    "vocab_topk",
    # events / sampling
    "sessionize",
    "sessionize_presplit",
    "asof_attach_last_mark",
    "stratified_sample",
    "split_assign",
    "salted_join",
    "sample_exact_k",
    "budget_select",
    "snapshot_diff",
    "media_dhash",
    "media_near_dupes",
    "read_tar_samples",
    "read_pipe_samples",
    # html extraction
    "html_main_content",
    # layout / windows
    "write_bucketed",
    "cobucketed_join",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
]
