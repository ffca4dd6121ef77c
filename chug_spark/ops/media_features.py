"""Multimodal media operators: decode / feature-extract / resize / frame-sample
as Arrow-batched UDFs over ``mapInPandas``.

The deterministic *eval-path* transforms of the reference's image stack are
implemented with numpy (no torch/PIL in this sandbox):

- crop_margin: threshold-bounded content crop
  (ref src/chug/image/transforms_torch.py:107-128 CropMargin)
- bitmap: LUT threshold <200 → 0, else keep value
  (ref src/chug/image/transforms_torch.py:29-38 Bitmap)
- erosion/dilation: min/max pooling over a k×k window
  (ref src/chug/image/transforms_torch.py:41-74)
- align_long_axis: orientation-mismatch rotate (transforms_torch.py:10-26)
- resize_keep_ratio + center_crop_or_pad, composed by doc_eval_transform —
  the full is_training=False pipeline of build_transforms_doc.py:25-42

Training-time *augmentations* (albumentations randomness) are out of scope —
SURVEY.md §2.9 D13.

Real decoders for true image/audio/video bytes are STUBBED behind
``decode_real_media`` (no codec libraries in this container); the Spark-side
plumbing — schema, batching, partitioning, UDF signatures — is real and
tested via the synthetic media format.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import media as media_mod

# ---------------------------------------------------------------------------
# numpy kernels (deterministic; mirror the reference's eval-path semantics)
# ---------------------------------------------------------------------------


def bitmap(arr: np.ndarray, threshold: int = 200) -> np.ndarray:
    """LUT threshold: <threshold → 0, else KEEP the value — the reference LUT
    is ``[0 if i < threshold else i]`` (transforms_torch.py:29-38), not a
    binarize-to-255."""
    return np.where(arr < threshold, 0, arr).astype(np.uint8)


def erosion(arr: np.ndarray, k: int = 3) -> np.ndarray:
    """Min-pool over k×k (stride 1, same padding) — transforms_torch.py:71-86."""
    return _pool(arr, k, np.minimum)


def dilation(arr: np.ndarray, k: int = 3) -> np.ndarray:
    """Max-pool over k×k (stride 1, same padding) — transforms_torch.py:89-104."""
    return _pool(arr, k, np.maximum)


def _pool(arr: np.ndarray, k: int, op) -> np.ndarray:
    pad = k // 2
    fill = 255 if op is np.minimum else 0
    padded = np.full((arr.shape[0] + 2 * pad, arr.shape[1] + 2 * pad), fill, arr.dtype)
    padded[pad:-pad or None, pad:-pad or None] = arr
    out = padded[0 : arr.shape[0], 0 : arr.shape[1]].copy()
    for dy in range(k):
        for dx in range(k):
            out = op(out, padded[dy : dy + arr.shape[0], dx : dx + arr.shape[1]])
    return out


def crop_margin(arr: np.ndarray, threshold: int = 200) -> tuple[int, int, int, int]:
    """Content bounding box after thresholding (CropMargin semantics,
    transforms_torch.py:107-128): returns (top, left, height, width); the
    full frame when no content."""
    mask = arr < threshold
    rows = np.any(mask, axis=1)
    cols = np.any(mask, axis=0)
    if not rows.any():
        return 0, 0, arr.shape[0], arr.shape[1]
    top, bottom = int(np.argmax(rows)), int(len(rows) - np.argmax(rows[::-1]))
    left, right = int(np.argmax(cols)), int(len(cols) - np.argmax(cols[::-1]))
    return top, left, bottom - top, right - left


def resize_keep_ratio(arr: np.ndarray, longest: int) -> np.ndarray:
    """Nearest-neighbor resize keeping aspect ratio, longest side → longest
    (the AlignLongAxis/resize step of build_transforms_doc.py)."""
    h, w = arr.shape[:2]
    scale = longest / max(h, w)
    nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
    ys = (np.arange(nh) * (h / nh)).astype(np.int64)
    xs = (np.arange(nw) * (w / nw)).astype(np.int64)
    return arr[ys][:, xs]


def align_long_axis(arr: np.ndarray, target_hw: tuple[int, int]) -> np.ndarray:
    """Rotate 90° clockwise (rotate(-90, expand=True)) when the image's
    orientation mismatches the target's (transforms_torch.py:10-26): portrait
    target + landscape image, or landscape target + portrait image."""
    th, tw = target_hw
    h, w = arr.shape[:2]
    if (th > tw and w > h) or (th < tw and w < h):
        return np.rot90(arr, k=-1).copy()
    return arr


def center_crop_or_pad(
    arr: np.ndarray, target_hw: tuple[int, int], fill: int = 255
) -> np.ndarray:
    """CenterCropOrPad(image_size, fill) — per axis: center-crop when larger,
    center-pad with ``fill`` when smaller (the Donut prepare_input pad,
    build_transforms_doc.py:41)."""
    th, tw = target_hw
    h, w = arr.shape[:2]
    # crop (center; extra pixel goes to the end, matching floor-div offsets)
    top = max(0, (h - th) // 2)
    left = max(0, (w - tw) // 2)
    arr = arr[top : top + th, left : left + tw]
    h, w = arr.shape[:2]
    out = np.full((th, tw), fill, dtype=arr.dtype)
    ot, ol = (th - h) // 2, (tw - w) // 2
    out[ot : ot + h, ol : ol + w] = arr
    return out


def doc_eval_transform(
    arr: np.ndarray,
    image_size: tuple[int, int],
    do_crop_margin: bool = True,
    do_align_long_axis: bool = True,
    fill: int = 255,
) -> np.ndarray:
    """The eval-path transform pipeline of build_transforms_doc.py:25-42
    (is_training=False): CropMargin → AlignLongAxis → ResizeKeepRatio
    (longest) → CenterCropOrPad — deterministic end to end, output always
    exactly ``image_size``."""
    if do_crop_margin:
        top, left, ch, cw = crop_margin(arr)
        arr = arr[top : top + ch, left : left + cw]
    if do_align_long_axis:
        arr = align_long_axis(arr, image_size)
    arr = resize_keep_ratio(arr, max(image_size))
    return center_crop_or_pad(arr, image_size, fill=fill)


def frame_sample_indices(num_frames: int, every: int) -> list[int]:
    """Deterministic frame sampling for video-like multi-page media."""
    return list(range(0, num_frames, max(1, every)))


def decode_real_media(payload: bytes, media_type: str):  # pragma: no cover
    """Decoder slot for real image/audio/video bytes.  The codec libraries
    (PIL/pypdfium2/av) are not in this container — plug them in here; the
    surrounding Spark plumbing is format-agnostic."""
    raise NotImplementedError(
        f"no codec for media_type={media_type!r} in this environment; "
        "use the synthetic synth:// payload format (chug_spark.media)"
    )


# ---------------------------------------------------------------------------
# Spark plumbing: mapInPandas feature extraction over media payload refs
# ---------------------------------------------------------------------------

MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("crop_top", T.IntegerType()),
        T.StructField("crop_left", T.IntegerType()),
        T.StructField("crop_h", T.IntegerType()),
        T.StructField("crop_w", T.IntegerType()),
        T.StructField("ink_ratio", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ]
)


def extract_media_features(
    docs_media: DataFrame,
    render_dpi: int = 96,
    frame_every: int = 1,
    resize_longest: int | None = 512,
) -> DataFrame:
    """(doc_id, media_ref) → per-page feature rows: render (or passthrough),
    optional resize-keep-ratio, bitmap→crop-margin box, ink ratio.

    The plan shape is the production shape for true multimodal columns:
    repartition on doc_id (even page distribution), render→feature→drop
    pixels inside the batch loop, flat feature rows out.
    """

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in MEDIA_FEATURES_SCHEMA.fields}

            def emit(**kw):
                for k in out:
                    out[k].append(kw.get(k))

            for doc_id, ref in zip(pdf["doc_id"], pdf["media_ref"]):
                try:
                    if not media_mod.is_payload_ref(ref):
                        emit(doc_id=doc_id, media_ref=ref, error="not_decodable")
                        continue
                    _mode, n_pages, seed = media_mod.parse_payload_ref(ref)
                    for page in frame_sample_indices(n_pages, frame_every):
                        arr = media_mod.render_page(seed, page, "L", render_dpi)
                        if resize_longest:
                            arr = resize_keep_ratio(arr, resize_longest)
                        bm = bitmap(arr)
                        top, left, ch, cw = crop_margin(bm)
                        emit(
                            doc_id=doc_id,
                            media_ref=ref,
                            page=page,
                            height=int(arr.shape[0]),
                            width=int(arr.shape[1]),
                            mean_px=float(arr.mean()),
                            crop_top=top, crop_left=left, crop_h=ch, crop_w=cw,
                            ink_ratio=float((bm == 0).mean()),
                        )
                        del arr, bm
                except Exception as exn:
                    emit(doc_id=doc_id, media_ref=ref,
                         error=f"{type(exn).__name__}")
            yield pd.DataFrame(out)

    n_parts = int(
        docs_media.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    return (
        docs_media.select("doc_id", "media_ref")
        .repartition(n_parts, "doc_id")
        .mapInPandas(body, schema=MEDIA_FEATURES_SCHEMA)
    )
