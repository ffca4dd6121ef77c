"""``pipe:`` shard sources: run a shell command per shard, treat its stdout
as a wds tar stream — the reference's primary remote-ingest idiom
(``source='pipe:curl -s -f -L https://.../train-{0000..2999}.tar'``,
reference README.md:145, via webdataset's ``url_opener``/``gopen``).

Spark-first shape: the brace-expanded shard list becomes a tiny DataFrame
(one row per shard command), repartitioned so each task owns one shard; the
command runs inside ``mapInPandas`` on the executor that will also expand
and group the stream — bytes never touch the driver and nothing shuffles.
Parallelism = shard count, exactly like the reference's per-shard worker
streaming but scheduled by Spark (locality-free: the data comes from the
remote, so any executor can own any shard — at 1000 executors the fan-out
is the full cluster).

Failure semantics mirror the reference's two modes: default is loud (a
failing command fails the task → Spark retries → job error); with
``handler='continue'`` a failed shard contributes zero members and one row
in the companion errors accounting (``log_and_continue``,
src/chug/wds/helpers.py — the nothrow pipeline's choice).
"""

from __future__ import annotations

import subprocess
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .manifest import expand_urls
from .registry import register_source
from .tar import MEMBER_SCHEMA, expand_tar_blob, group_members_adjacent

PIPE_MEMBER_SCHEMA = MEMBER_SCHEMA + ", error string"


def pipe_members(
    spark: SparkSession, spec: str, handler: str = "raise", timeout: int = 600
) -> DataFrame:
    """``spec`` (brace/::/env-expandable command template, WITHOUT the
    ``pipe:`` prefix) → flat member rows (shard=command, idx, fname, data,
    error).  ``handler='continue'`` turns a failed command into a single
    (shard, error) row instead of a task failure."""
    if handler not in ("raise", "continue"):
        raise ValueError(f"handler must be 'raise' or 'continue', got {handler!r}")
    cmds, _ = expand_urls(spec)
    if not cmds:
        raise ValueError(f"pipe spec expanded to zero shards: {spec!r}")
    df = spark.createDataFrame([(c,) for c in cmds], "cmd string").repartition(
        len(cmds), "cmd"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for cmd in pdf["cmd"]:
                try:
                    proc = subprocess.run(
                        cmd, shell=True, capture_output=True, timeout=timeout
                    )
                    if proc.returncode != 0:
                        raise RuntimeError(
                            f"exit {proc.returncode}: "
                            f"{proc.stderr[:500].decode(errors='replace')}"
                        )
                    out = expand_tar_blob(cmd, proc.stdout)
                    out["error"] = None
                except Exception as exn:
                    if handler == "raise":
                        raise
                    out = pd.DataFrame(
                        {
                            "shard": [cmd],
                            "idx": [-1],
                            "fname": [None],
                            "data": [None],
                            "error": [f"{type(exn).__name__}: {exn}"],
                        }
                    )
                yield out

    return df.mapInPandas(run, schema=PIPE_MEMBER_SCHEMA)


def read_pipe_samples(
    spark: SparkSession, spec: str, handler: str = "raise", timeout: int = 600
) -> tuple[DataFrame, DataFrame]:
    """Full pipe ingest: command fan-out → tar expansion → adjacency
    grouping.  Returns ``(samples, errors)``; samples carry the usual
    (shard, sample_no, doc_id, spans) contract, errors are
    (shard, error) rows for failed shards (empty under handler='raise')."""
    members = pipe_members(spark, spec, handler=handler, timeout=timeout)
    errors = members.filter(members["error"].isNotNull()).select("shard", "error")
    ok = members.filter(members["error"].isNull()).drop("error")
    return group_members_adjacent(ok), errors


@register_source("pipe")
def _read_pipe(spark: SparkSession, locator: str) -> DataFrame:
    samples, _errors = read_pipe_samples(spark, locator)
    return samples.select("doc_id", "spans")
