"""Manual task (reference src/chug/task_pipeline/pipeline_manual.py:16-27):
a pipeline that relies fully on a user-supplied decode_and_process_fn.

Spark analogue: the user supplies a ``mapInPandas`` function + output schema;
errors follow the log_and_continue default (rows that raise are skipped
per-batch, collected as error rows when the function uses ``safe_map``).
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def build_manual(df: DataFrame, decode_and_process_fn: Callable, schema) -> DataFrame:
    """Run a user decode_and_process_fn via mapInPandas (the reference wraps
    the user's callable in wds.map with log_and_continue,
    pipeline_manual.py:21-26)."""
    assert decode_and_process_fn is not None
    return df.mapInPandas(decode_and_process_fn, schema=schema)


def safe_map(per_row_fn: Callable[[dict], dict | None], out_fields: list[str]):
    """Adapt a per-row sample function into a skip-on-error mapInPandas body
    (the log_and_continue semantics of wds/filters.py:49-70 _map_v2: None
    results and raising rows are dropped)."""

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in out_fields}
            for row in pdf.to_dict(orient="records"):
                try:
                    result = per_row_fn(row)
                except Exception:
                    continue
                if result is None:
                    continue
                for k in out_fields:
                    out[k].append(result.get(k))
            yield pd.DataFrame(out)

    return body
