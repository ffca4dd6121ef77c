"""Streaming as-of join: cross-batch last-mark state per user.

The batch as-of join (``ops/events.asof_attach_last_mark``) needs the whole
timeline; a streaming ingest sees it in micro-batches.  This operator keeps
the latest mark per user in Spark's managed state store
(``applyInPandasWithState`` keyed on user_id), so a mark drained in batch 1
annotates events arriving in batch 7 — state shards with the shuffle and
scales with the state store, never driver memory.

Ordering contract (documented, tested): events are processed in event-time
order WITHIN each micro-batch (the group is sorted before the scan), and
batches are assumed time-ordered between themselves — the standard
append-only ingest layout (hourly/daily drops).  An out-of-order mark
arriving a batch late annotates only later events (exactly what a
low-watermark streaming asof can promise without full reordering); the
batch operator remains the backfill-correct form.
"""

from __future__ import annotations

import os
from typing import Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ASOF_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("last_mark_id", T.LongType()),
        T.StructField("us_since_mark", T.LongType()),
    ]
)
# (mark_tus, mark_id) of the latest mark seen for this user
_STATE_SCHEMA = T.StructType(
    [T.StructField("mark_tus", T.LongType()), T.StructField("mark_id", T.LongType())]
)


def _make_asof_fn(mark_type: str):
    def fn(key, pdf_iter, state: GroupState):
        user_id = key[0]
        mark_tus, mark_id = state.get if state.exists else (None, None)
        outs = []
        chunks = [p for p in pdf_iter if len(p)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            # event-time order within the batch; marks before events at
            # equal time (is_event tie-break), ids for full determinism
            pdf["is_event"] = (pdf["event_type"] != mark_type).astype(int)
            pdf = pdf.sort_values(["tus", "is_event", "event_id"], kind="mergesort")
            # batch-asof tie rule: marks sharing a timestamp dedupe to the
            # max event_id, and every mark row (an event too) self-matches
            # that group max
            is_mark = pdf["is_event"].to_numpy() == 0
            group_max = (
                pdf["event_id"].where(pd.Series(is_mark, index=pdf.index))
                .groupby(pdf["tus"]).transform("max")
            ).to_numpy()
            for tus, eid, is_event, gmax in zip(
                pdf["tus"].to_numpy(), pdf["event_id"].to_numpy(),
                pdf["is_event"].to_numpy(), group_max,
            ):
                if not is_event:
                    if mark_tus is None or (int(tus), int(gmax)) >= (mark_tus, mark_id):
                        mark_tus, mark_id = int(tus), int(gmax)
                outs.append(
                    (int(eid), int(user_id),
                     mark_id, int(tus) - mark_tus if mark_tus is not None else None)
                )
        if mark_tus is not None:
            state.update((mark_tus, mark_id))
        if not outs:
            return iter(())
        return iter(
            [pd.DataFrame(outs, columns=[f.name for f in ASOF_OUT_SCHEMA.fields])]
        )

    return fn


def run_stream_asof(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    mark_type: str = "error",
    max_files_per_trigger: Optional[int] = None,
) -> None:
    """File-stream → stateful last-mark attach → append sink.  Input files:
    parquet with (event_id long, ts timestamp, user_id long, event_type
    string, value double)."""
    from ..ops.events import epoch_us

    out_path = os.path.join(output_dir, "asof")
    ckpt = os.path.join(output_dir, "_asof_checkpoint")

    reader = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir).select(
        "event_id", "user_id", "event_type", epoch_us("ts").alias("tus")
    )

    attached = stream.groupBy("user_id").applyInPandasWithState(
        _make_asof_fn(mark_type),
        outputStructType=ASOF_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        attached.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_asof_output(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(output_dir, "asof"))
