"""Natural-image transform pipelines: the image_basic / image_timm legs.

Closes the last D13 slice (SURVEY.md §2): the reference builds these with
torchvision/timm (``src/chug/image/build_transforms_image.py:16-203``);
here the same *semantics* are numpy kernels driven from Arrow-batched
``mapInPandas`` — no torch/PIL in this sandbox, and at corpus scale the
vectorized-batch shape is what matters, not the tensor library.

Eval path (``is_training=False``, build_transforms_image.py:166-196), by
``resize_mode``:

- ``shortest``: scale so the image COVERS the target box (shortest edge →
  target for square targets; torchvision ``Resize(scalar)``), then center
  crop;
- ``longest``: scale so the image FITS INSIDE the box (timm
  ``ResizeKeepRatio(longest=1)``), then ``CenterCropOrPad`` with the fill
  color;
- ``squash``: resize to exactly (H, W), aspect be damned.

then ToTensor (/255) + Normalize(mean, std) — config defaults mirror the
reference's ``ImageInputCfg`` (size 512², mode 'L', mean=std=0.5, fill 255,
``common/config.py:18-28``).

Train path (build_transforms_image.py:117-133): torchvision's
RandomResizedCrop parameter algorithm — 10 attempts of (area-scale,
log-uniform aspect) then the ratio-clamped center fallback — with every
draw replaced by the deterministic md5 primitive (:func:`aug_draw`), so a
retried Spark task reproduces identical pixels; optional
brightness/contrast jitter from ``ImageAugCfg`` presets
(``common/config.py:120-137`` clip/imagenet).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .. import media as media_mod
from .media_features import (
    aug_draw,
    aug_uniform,
    center_crop_or_pad,
    color_jitter,
)

#: ImageAugCfg presets (reference common/config.py:120-137)
AUG_CLIP = dict(scale=(0.9, 1.0), ratio=(0.75, 1.0 / 0.75))
AUG_IMAGENET = dict(
    scale=(0.08, 1.0), ratio=(0.75, 1.0 / 0.75), color_jitter=(0.4, 0.4, 0.4)
)

RESIZE_MODES = ("shortest", "longest", "squash")


def resize_exact(arr: np.ndarray, target_hw: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize to exactly (H, W); channel-agnostic."""
    th, tw = target_hw
    h, w = arr.shape[:2]
    ys = (np.arange(th) * (h / th)).astype(np.int64)
    xs = (np.arange(tw) * (w / tw)).astype(np.int64)
    return arr[ys][:, xs]


def _scale_keep_ratio(
    arr: np.ndarray, target_hw: tuple[int, int], cover: bool
) -> np.ndarray:
    """Aspect-preserving resize: ``cover=True`` scales until the target box
    is covered (shortest-edge mode), ``cover=False`` until the image fits
    inside it (longest-edge mode)."""
    th, tw = target_hw
    h, w = arr.shape[:2]
    r = min(h / th, w / tw) if cover else max(h / th, w / tw)
    nh, nw = max(1, int(round(h / r))), max(1, int(round(w / r)))
    return resize_exact(arr, (nh, nw))


def center_crop(arr: np.ndarray, target_hw: tuple[int, int]) -> np.ndarray:
    th, tw = target_hw
    h, w = arr.shape[:2]
    top, left = max(0, (h - th) // 2), max(0, (w - tw) // 2)
    return arr[top : top + th, left : left + tw]


def image_eval_transform(
    arr: np.ndarray,
    image_size: tuple[int, int] = (64, 64),
    resize_mode: str = "shortest",
    fill: int = 255,
) -> np.ndarray:
    """is_training=False pipeline of build_transforms_image.py:166-196;
    output is always exactly ``image_size``."""
    assert resize_mode in RESIZE_MODES, resize_mode
    if resize_mode == "squash":
        return resize_exact(arr, image_size)
    if resize_mode == "longest":
        arr = _scale_keep_ratio(arr, image_size, cover=False)
        return center_crop_or_pad(arr, image_size, fill=fill)
    arr = _scale_keep_ratio(arr, image_size, cover=True)
    return center_crop(arr, image_size)


def random_resized_crop(
    arr: np.ndarray,
    image_size: tuple[int, int],
    key: str,
    scale: tuple[float, float] = (0.08, 1.0),
    ratio: tuple[float, float] = (0.75, 1.0 / 0.75),
) -> tuple[np.ndarray, tuple[int, int, int, int]]:
    """torchvision RandomResizedCrop.get_params with md5-keyed draws:
    10 attempts of (uniform area scale, log-uniform aspect), then the
    ratio-clamped center-crop fallback.  Returns (resized crop,
    (top, left, h, w)) — the box is emitted downstream so the *schedule*
    is value-pinnable even though pixels are rows-only."""
    h, w = arr.shape[:2]
    area = float(h * w)
    box = None
    for attempt in range(10):
        ta = area * aug_uniform(f"{key}|rrc{attempt}|area", scale[0], scale[1])
        ar = math.exp(
            aug_uniform(
                f"{key}|rrc{attempt}|ratio", math.log(ratio[0]), math.log(ratio[1])
            )
        )
        cw = int(round(math.sqrt(ta * ar)))
        ch = int(round(math.sqrt(ta / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            top = int(aug_draw(f"{key}|rrc{attempt}|top") * (h - ch + 1))
            left = int(aug_draw(f"{key}|rrc{attempt}|left") * (w - cw + 1))
            box = (top, left, ch, cw)
            break
    if box is None:
        in_ratio = w / h
        if in_ratio < ratio[0]:
            cw = w
            ch = min(h, int(round(cw / ratio[0])))
        elif in_ratio > ratio[1]:
            ch = h
            cw = min(w, int(round(ch * ratio[1])))
        else:
            ch, cw = h, w
        box = ((h - ch) // 2, (w - cw) // 2, ch, cw)
    top, left, ch, cw = box
    return resize_exact(arr[top : top + ch, left : left + cw], image_size), box


def image_train_transform(
    arr: np.ndarray,
    image_size: tuple[int, int],
    key: str,
    aug: dict = AUG_CLIP,
) -> tuple[np.ndarray, tuple[int, int, int, int]]:
    """is_training=True pipeline (build_transforms_image.py:117-150):
    RandomResizedCrop + optional brightness/contrast jitter (the first two
    ColorJitter channels; hue/saturation are no-ops in mode 'L')."""
    out, box = random_resized_crop(
        arr, image_size, key,
        scale=aug.get("scale", (1.0, 1.0)),
        ratio=aug.get("ratio", (1.0, 1.0)),
    )
    cj = aug.get("color_jitter")
    if cj:
        b = aug_uniform(f"{key}|cj_b", max(0.0, 1.0 - cj[0]), 1.0 + cj[0])
        c = aug_uniform(f"{key}|cj_c", max(0.0, 1.0 - cj[1]), 1.0 + cj[1])
        out = color_jitter(out, b, c)
    return out, box


def to_tensor_normalize(
    arr: np.ndarray, mean: float = 0.5, std: float = 0.5
) -> np.ndarray:
    """ToTensor + Normalize (ImageInputCfg defaults mean=std=0.5)."""
    return ((arr.astype(np.float32) / 255.0) - mean) / std


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

IMAGE_TENSOR_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("resize_mode", T.StringType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("t_mean", T.DoubleType()),
        T.StructField("t_min", T.DoubleType()),
        T.StructField("t_max", T.DoubleType()),
        T.StructField("rrc_top", T.IntegerType()),
        T.StructField("rrc_left", T.IntegerType()),
        T.StructField("rrc_h", T.IntegerType()),
        T.StructField("rrc_w", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)


def extract_image_tensors(
    docs_media: DataFrame,
    image_size: tuple[int, int] = (64, 64),
    is_training: bool = False,
    aug: dict = AUG_CLIP,
    render_dpi: int = 24,
    mean: float = 0.5,
    std: float = 0.5,
    seed: int = 0,
) -> DataFrame:
    """(doc_id, media_ref[, resize_mode]) → normalized-tensor stats per page
    through the natural-image pipeline.  Eval rows honor their per-row
    ``resize_mode`` (default 'shortest'); train rows run RandomResizedCrop
    and carry the drawn box.  Same production plan shape as the doc leg:
    repartition on doc_id, decode → transform → drop pixels inside the
    batch, flat stat rows out."""
    cols = ["doc_id", "media_ref"] + (
        ["resize_mode"] if "resize_mode" in docs_media.columns else []
    )

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in IMAGE_TENSOR_SCHEMA.fields}

            def emit(**kw):
                for k in out:
                    out[k].append(kw.get(k))

            modes = (
                pdf["resize_mode"]
                if "resize_mode" in pdf.columns
                else ["shortest"] * len(pdf)
            )
            for doc_id, ref, mode in zip(pdf["doc_id"], pdf["media_ref"], modes):
                try:
                    if not media_mod.is_payload_ref(ref):
                        emit(doc_id=doc_id, media_ref=ref, error="not_decodable")
                        continue
                    _m, n_pages, pseed = media_mod.parse_payload_ref(ref)
                    for page in range(n_pages):
                        arr = media_mod.render_page(pseed, page, "L", render_dpi)
                        box = (None,) * 4
                        if is_training:
                            arr, box = image_train_transform(
                                arr, image_size,
                                f"img|{doc_id}|{page}|{seed}", aug,
                            )
                            mode = "train"
                        else:
                            arr = image_eval_transform(arr, image_size, mode)
                        t = to_tensor_normalize(arr, mean, std)
                        emit(
                            doc_id=doc_id, media_ref=ref, page=page,
                            resize_mode=mode,
                            height=int(t.shape[0]), width=int(t.shape[1]),
                            t_mean=round(float(t.mean()), 6),
                            t_min=round(float(t.min()), 6),
                            t_max=round(float(t.max()), 6),
                            rrc_top=box[0], rrc_left=box[1],
                            rrc_h=box[2], rrc_w=box[3],
                        )
                        del arr, t
                except Exception as exn:
                    emit(doc_id=doc_id, media_ref=ref, error=type(exn).__name__)
            yield pd.DataFrame(out)

    n_parts = int(
        docs_media.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    return (
        docs_media.select(*cols)
        .repartition(n_parts, "doc_id")
        .mapInPandas(body, schema=IMAGE_TENSOR_SCHEMA)
    )
