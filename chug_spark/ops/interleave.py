"""Interleaved-stream pairing ops: mine an (image, caption) pair for every
media span from its surrounding text spans.

The reference's image-text task consumes shards where each sample already
carries an explicit image + caption pair (ref
src/chug/task_pipeline/pipeline_image_text.py:23-30 — ``filter_incomplete``
demands both keys).  At web scale the pair usually is NOT explicit: an
interleaved (text | media) span stream per document (the engine's flagship
output shape) is all there is, and the caption must be MINED from the text
spans adjacent to each media span — the standard interleaved-corpus recipe
(alt-text/neighboring-sentence pairing).

Scale shape: ONE shuffle (hash on doc_id), then two frame-bounded window
scans over the per-doc span stream — running ``last(text) IGNORE NULLS``
before each row and ``first(text) IGNORE NULLS`` after it.  Both windows
share the same partitioning + ordering, so Catalyst plans a single sort;
per-doc span counts are bounded upstream by the extract pipeline's page
capping, so no partition outgrows memory.  Zero Python, all codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mine_captions(spans: DataFrame, max_chars: int = 160) -> DataFrame:
    """(doc_id, offset, kind, text, media_ref) interleaved span rows →
    one row per media span:

    (doc_id, offset, media_ref, before_text, after_text, caption, cap_src)

    ``before_text``/``after_text`` are the nearest non-empty text spans
    (by offset, same doc) on either side, whitespace-trimmed and truncated
    to ``max_chars``.  ``caption`` prefers the following text span (in
    document order a caption conventionally trails its figure), falling
    back to the preceding one; ``cap_src`` records which side won
    ('after' | 'before' | 'none' — media with no text neighbors at all).
    """
    txt = F.nullif(F.trim(F.col("text")), F.lit(""))
    w = Window.partitionBy("doc_id").orderBy("offset")
    before = F.last(
        F.when(F.col("kind") == "text", txt), ignorenulls=True
    ).over(w.rowsBetween(Window.unboundedPreceding, -1))
    after = F.first(
        F.when(F.col("kind") == "text", txt), ignorenulls=True
    ).over(w.rowsBetween(1, Window.unboundedFollowing))
    enriched = spans.select(
        "doc_id", "offset", "kind", "media_ref",
        F.substring(before, 1, max_chars).alias("before_text"),
        F.substring(after, 1, max_chars).alias("after_text"),
    ).filter(F.col("kind") == "media")
    caption = F.coalesce(F.col("after_text"), F.col("before_text"))
    cap_src = (
        F.when(F.col("after_text").isNotNull(), F.lit("after"))
        .when(F.col("before_text").isNotNull(), F.lit("before"))
        .otherwise(F.lit("none"))
    )
    return enriched.select(
        "doc_id", "offset", "media_ref", "before_text", "after_text",
        caption.alias("caption"), cap_src.alias("cap_src"),
    )
