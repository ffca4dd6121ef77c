"""Image+text task pipeline (reference
src/chug/task_pipeline/pipeline_image_text.py:32-90): validity filter →
decode → coalesce-rename → per-feature map → tuple projection.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import ImageTextTaskCfg
from ..functions import coalesce_rename, filter_incomplete


def build_image_text(
    df: DataFrame,
    cfg: Optional[ImageTextTaskCfg] = None,
    image_process: Optional[Callable] = None,
    text_process: Optional[Callable] = None,
) -> DataFrame:
    """Spark plan for the image-text task:

    - cfg.filter_valid → filter_incomplete BEFORE decode/rename (the
      reference's pushdown tactic, pipeline_image_text.py:42-50);
    - coalesce-rename with keep=False (wds.rename(**rename_dict, keep=False),
      :63-70);
    - optional per-feature transforms (wds.map_dict, :73-80) as Column
      functions (image_process/text_process take and return a Column);
    - cfg.output_tuple → positional projection (wds.to_tuple, :82-88).
    """
    cfg = cfg or ImageTextTaskCfg()
    img_out = cfg.image_input_feat.output_name or "image_input"
    txt_out = cfg.text_input_feat.output_name or "text"

    out = df
    if cfg.filter_valid:
        out = filter_incomplete(
            out, cfg.image_input_feat.input_key, cfg.text_input_feat.input_key
        )
    keep_keys = [c for c in ("doc_id",) if c in out.columns]
    out = coalesce_rename(
        out,
        {
            **{k: k for k in keep_keys},
            img_out: cfg.image_input_feat.input_key,
            txt_out: cfg.text_input_feat.input_key,
        },
        keep=False,
    )
    if image_process is not None:
        out = out.withColumn(img_out, image_process(F.col(img_out)))
    if text_process is not None:
        out = out.withColumn(txt_out, text_process(F.col(txt_out)))
    if cfg.output_tuple:
        out = out.select(img_out, txt_out)
    return out
