"""Ground-truth-parse task (reference
src/chug/task_pipeline/pipeline_gtparse.py:35-93): the image-text pipeline
with text key 'ground_truth'.

NOTE: the reference's rename_dict maps the *image* output from the text input
key (pipeline_gtparse.py:66-67) — an acknowledged bug per SURVEY.md §2.12; we
implement the evident intent (image from image keys) instead of replicating
the bug.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame

from ..config import FeatureInfo, ImageFeatureInfo, ImageTextTaskCfg
from ..schema import DEFAULT_GT_KEY, DEFAULT_IMG_KEY
from .imagetext import build_image_text


def build_gtparse(
    df: DataFrame,
    filter_valid: bool = True,
    output_tuple: bool = False,
    image_process: Optional[Callable] = None,
    text_process: Optional[Callable] = None,
) -> DataFrame:
    cfg = ImageTextTaskCfg(
        image_input_feat=ImageFeatureInfo("image_input", DEFAULT_IMG_KEY, "L"),
        text_input_feat=FeatureInfo("ground_truth", DEFAULT_GT_KEY),
        filter_valid=filter_valid,
        output_tuple=output_tuple,
    )
    return build_image_text(df, cfg, image_process=image_process, text_process=text_process)
