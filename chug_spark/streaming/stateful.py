"""Custom stateful streaming operator: cross-batch exact dedup.

The reference pipeline dedups nothing (curation happens upstream); a
streaming ingest at corpus scale needs exactly this: emit a document only
the FIRST time its content fingerprint is seen, across micro-batches, with
the seen-set held in Spark's managed state store (not driver memory).

Built on ``applyInPandasWithState`` — the Structured Streaming custom-
stateful-operator API (the brief's designated slot for operators Spark
lacks).  State is keyed by content fingerprint, so it shards across
executors with the shuffle and scales with the state store (RocksDB in
production), not with any single process.
"""

from __future__ import annotations

import os
from typing import Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("fingerprint", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)
_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def _dedup_fn(key, pdf_iter, state: GroupState):
    """Emit the lexicographically-first doc_id of this fingerprint on first
    sight; later batches with the same fingerprint emit nothing.  The
    min-doc_id rule (within the batch that first sees the fingerprint) keeps
    output schedule-independent."""
    fingerprint = key[0]
    if state.exists:
        return iter(())
    best: Optional[tuple] = None
    for pdf in pdf_iter:
        if len(pdf) == 0:  # pragma: no cover
            continue
        # vectorized per-chunk min (no per-row Python loop in the hot path):
        # idxmin over the string-cast ids, then reduce across chunks
        ids = pdf["doc_id"].astype(str)
        i = ids.idxmin()
        cand = (ids.loc[i], str(pdf["text"].loc[i]))
        if best is None or cand[0] < best[0]:
            best = cand
    state.update((True,))
    if best is None:  # pragma: no cover
        return iter(())
    return iter(
        [pd.DataFrame({"doc_id": [best[0]], "fingerprint": [fingerprint],
                       "text": [best[1]]})]
    )


def fingerprint_col(text):
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"(?U)\s+", " ")))


def run_stream_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    max_files_per_trigger: Optional[int] = None,
) -> None:
    """File-stream → stateful first-seen dedup → append sink.

    Input files: parquet with (doc_id string, text string).  Output:
    (doc_id, fingerprint, text) — one row per distinct normalized text
    across ALL drains of this checkpoint (Trigger.AvailableNow per call)."""
    out_path = os.path.join(output_dir, "unique")
    ckpt = os.path.join(output_dir, "_checkpoint")

    reader = spark.readStream.schema(
        "doc_id string, text string"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    deduped = (
        stream.withColumn("fingerprint", fingerprint_col(F.col("text")))
        .groupBy("fingerprint")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=DEDUP_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_dedup_output(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(output_dir, "unique"))
