"""Structured Streaming variant of the extraction job.

The reference is an unbounded-stream loader with *no* event-time semantics —
no watermarks, windows, or stateful ops (SURVEY.md §2.11); its resampled
shard mode yields shards forever (src/chug/wds/shardlists.py:115-119).  The
streaming analogue that matters for a batch extraction engine is
*incremental ingest*: new document files appear, only they get decoded.

``run_stream_extract`` reads the span table as a file stream and runs the
identical batch plan per micro-batch via foreachBatch —
``Trigger.AvailableNow`` drains everything currently available and stops;
the streaming checkpoint gives exactly-once file-level progress, so re-runs
after failure or after new files arrive decode only unseen input (the
streaming twin of the bucket checkpoint table).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..config import ExtractJobCfg
from ..extract import extract_docread, flatten_spans
from ..schema import DOCUMENTS_SCHEMA


def run_stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    cfg: Optional[ExtractJobCfg] = None,
    max_files_per_trigger: Optional[int] = None,
) -> None:
    """Drain all currently-available document files through the extraction
    plan (Trigger.AvailableNow) with exactly-once progress tracking.

    Layout under ``output_dir``: spans/ errors/ _checkpoint/.
    """
    cfg = (cfg or ExtractJobCfg()).validate()
    spans_path = os.path.join(output_dir, "spans")
    errors_path = os.path.join(output_dir, "errors")
    ckpt = os.path.join(output_dir, "_checkpoint")

    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spans_out, errors = extract_docread(batch_df.sparkSession, batch_df, cfg)
        flatten_spans(spans_out).write.mode("append").parquet(spans_path)
        errors.write.mode("append").parquet(errors_path)

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_stream_output(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(output_dir, "spans"))
