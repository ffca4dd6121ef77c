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

The training-time *augmentation* path (ref build_transforms_doc.py:70-162,
``is_training=True``) is implemented too — with DETERMINISTIC hash-keyed
draws instead of torch RNG state: every random decision (apply-or-not, drawn
scale/shear/offset...) is a pure function of (doc_id, page, stage, seed) via
md5, the same schedule-independence discipline as the page-sampling policies.
That makes the augmentation *schedule* oracle-checkable in SQL (query
``aug_schedule``) while the pixel kernels stay numpy (rows-only checked).

Real decoders for true image/audio/video bytes are STUBBED behind
``decode_real_media`` (no codec libraries in this container); the Spark-side
plumbing — schema, batching, partitioning, UDF signatures — is real and
tested via the synthetic media format.
"""

from __future__ import annotations

import importlib.util
import io
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


# ---------------------------------------------------------------------------
# train-path augmentations (ref build_transforms_doc.py:70-162, is_training) —
# deterministic md5-keyed draws replace torch RNG state
# ---------------------------------------------------------------------------

# defaults lifted verbatim from the reference's doc_better train path
# (src/chug/image/build_transforms_doc.py:72-95)
DOC_TRAIN_DEFAULTS = dict(
    scale_prob=0.05,
    scale_range=(0.85, 1.04),
    ratio_prob=0.05,
    ratio_range=(0.9, 1.11),
    bitmap_prob=0.55,
    erosion_dilation_prob=0.02,
    shear_prob=0.05,
    shear_range_x=(0.0, 3.0),
    shear_range_y=(-3.0, 0.0),
    shift_scale_rotate_prob=0.03,
    shift_range_x=0.04,
    shift_range_y=0.03,
    rotate_range=3,
    elastic_prob=0.04,
    elastic_alpha=50.0,
    elastic_sigma=12.0,
    brightness_contrast_prob=0.04,
    brightness_range=0.1,
    contrast_range=0.1,
    gaussian_blur_prob=0.03,
    gaussian_blur_kernel=3,
)


def aug_draw(key: str) -> float:
    """Uniform [0,1) from the first 8 md5 hex chars of ``key`` — the one
    randomness primitive of the train path.  Engine-portable: DuckDB
    reproduces it as conv(substr(md5(key),1,8),16,10)/2^32, so every
    apply-or-not decision and drawn magnitude is oracle-checkable."""
    import hashlib

    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) / 2**32


def aug_uniform(key: str, lo: float, hi: float) -> float:
    return lo + (hi - lo) * aug_draw(key)


def random_crop_or_pad(
    arr: np.ndarray, target_hw: tuple[int, int], key: str, fill: int = 255
) -> np.ndarray:
    """timm RandomCropOrPad semantics: per axis, a uniformly drawn crop
    offset when larger than target, a uniformly drawn pad offset when
    smaller (build_transforms_doc.py:160 — the train-time counterpart of
    CenterCropOrPad)."""
    th, tw = target_hw
    h, w = arr.shape[:2]
    top = int(aug_draw(key + "|croptop") * (h - th + 1)) if h > th else 0
    left = int(aug_draw(key + "|cropleft") * (w - tw + 1)) if w > tw else 0
    arr = arr[top : top + th, left : left + tw]
    h, w = arr.shape[:2]
    out = np.full((th, tw), fill, dtype=arr.dtype)
    ot = int(aug_draw(key + "|padtop") * (th - h + 1)) if h < th else 0
    ol = int(aug_draw(key + "|padleft") * (tw - w + 1)) if w < tw else 0
    out[ot : ot + h, ol : ol + w] = arr
    return out


def affine_warp(
    arr: np.ndarray,
    shear_x_deg: float = 0.0,
    shear_y_deg: float = 0.0,
    rotate_deg: float = 0.0,
    shift_x: float = 0.0,
    shift_y: float = 0.0,
    scale: float = 1.0,
    fill: int = 255,
) -> np.ndarray:
    """Nearest-neighbor affine about the image center (torchvision
    RandomAffine semantics: scale ∘ rotate ∘ shear ∘ translate, fill
    outside) — shared kernel for the shear stage and the
    shift-scale-rotate stage (nougat SSR carries its scale_limit here)."""
    h, w = arr.shape[:2]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    a = np.deg2rad(rotate_deg)
    sx, sy = np.tan(np.deg2rad(shear_x_deg)), np.tan(np.deg2rad(shear_y_deg))
    # forward matrix M = scale * (R @ Shear); sample with the inverse map
    m = scale * np.array(
        [
            [np.cos(a) - np.sin(a) * sy, np.cos(a) * sx - np.sin(a)],
            [np.sin(a) + np.cos(a) * sy, np.sin(a) * sx + np.cos(a)],
        ]
    )
    minv = np.linalg.inv(m)
    ys, xs = np.mgrid[0:h, 0:w]
    dy, dx = ys - cy - shift_y * h, xs - cx - shift_x * w
    src_y = minv[0, 0] * dy + minv[0, 1] * dx + cy
    src_x = minv[1, 0] * dy + minv[1, 1] * dx + cx
    syi = np.round(src_y).astype(np.int64)
    sxi = np.round(src_x).astype(np.int64)
    valid = (syi >= 0) & (syi < h) & (sxi >= 0) & (sxi < w)
    out = np.full((h, w), fill, dtype=arr.dtype)
    out[valid] = arr[syi[valid], sxi[valid]]
    return out


def _box_blur_1d(arr: np.ndarray, radius: int, axis: int) -> np.ndarray:
    """Running-mean box blur along one axis (edge-replicated): windowed sums
    as a difference of cumulative sums — O(n) regardless of radius."""
    if radius <= 0:
        return arr
    n = arr.shape[axis]
    pad = [(0, 0), (0, 0)]
    pad[axis] = (radius, radius)
    c = np.cumsum(np.pad(arr, pad, mode="edge"), axis=axis, dtype=np.float64)
    width = 2 * radius + 1

    def take(lo, hi):
        sl = [slice(None), slice(None)]
        sl[axis] = slice(lo, hi)
        return c[tuple(sl)]

    upper = take(width - 1, width - 1 + n)
    first = take(width - 1, width)
    lower = np.concatenate([np.zeros_like(first), take(0, n - 1)], axis=axis)
    return (upper - lower) / width


def gaussian_blur(arr: np.ndarray, sigma: float, passes: int = 3) -> np.ndarray:
    """Separable Gaussian approximation: ``passes`` box blurs per axis whose
    composed variance matches sigma² (the standard 3-box approximation —
    exactness is not required; determinism is)."""
    if sigma <= 0:
        return arr.astype(np.float64)
    radius = max(1, int(round(np.sqrt(sigma * sigma * 3.0 / passes))))
    out = arr.astype(np.float64)
    for _ in range(passes):
        out = _box_blur_1d(out, radius, 0)
        out = _box_blur_1d(out, radius, 1)
    return out


def elastic_warp(
    arr: np.ndarray, key: str, alpha: float = 50.0, sigma: float = 12.0,
    fill: int = 255,
) -> np.ndarray:
    """ElasticTransform: displacement field = smoothed uniform noise × alpha
    (torchvision semantics; smoothing by the deterministic box-Gaussian).
    Noise is md5-keyed per 8×8 coarse cell, upsampled — pixel-exact
    reproducible anywhere."""
    h, w = arr.shape[:2]
    gh, gw = max(1, h // 8), max(1, w // 8)
    seed = int.from_bytes(
        __import__("hashlib").md5(key.encode()).digest()[:8], "big"
    )
    rng = np.random.default_rng(seed)  # seeded from md5 → deterministic
    coarse = rng.uniform(-1.0, 1.0, size=(2, gh, gw))
    ys, xs = np.mgrid[0:h, 0:w]
    cy, cx = ys * gh // h, xs * gw // w  # nearest upsample to exactly (h, w)
    dy = gaussian_blur(coarse[0][cy, cx], sigma / 8) * alpha
    dx = gaussian_blur(coarse[1][cy, cx], sigma / 8) * alpha
    syi = np.clip(np.round(ys + dy), 0, h - 1).astype(np.int64)
    sxi = np.clip(np.round(xs + dx), 0, w - 1).astype(np.int64)
    out = arr[syi, sxi]
    return out


def color_jitter(arr: np.ndarray, brightness: float, contrast: float) -> np.ndarray:
    """Brightness/contrast jitter (ColorJitter): multiply by the brightness
    factor, then blend toward the mean by the contrast factor; clip to u8."""
    out = arr.astype(np.float64) * brightness
    mean = out.mean()
    out = (out - mean) * contrast + mean
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _md5_rng(key: str) -> np.random.Generator:
    """Generator seeded from md5(key) — the vectorized companion of
    :func:`aug_draw` for field-shaped noise (elastic fields, gaussian
    noise): deterministic on any executor, any retry."""
    seed = int.from_bytes(__import__("hashlib").md5(key.encode()).digest()[:8], "big")
    return np.random.default_rng(seed)


def grid_distort(
    arr: np.ndarray, key: str, distort_limit: float = 0.05, num_steps: int = 5
) -> np.ndarray:
    """albumentations GridDistortion semantics (nougat stage,
    ref build_transforms_doc.py:271-277): the image is cut into
    ``num_steps`` cells per axis, each cell's width/height is stretched by
    an independent 1+u factor (u ~ U[-limit, limit], md5-keyed per cell),
    and the warped grid is resampled back to the original size
    (nearest-neighbor, like the other deterministic kernels here)."""
    h, w = arr.shape[:2]

    def axis_map(n: int, tag: str) -> np.ndarray:
        # stretched cumulative cell edges -> source coordinate per output px
        facs = np.array(
            [1.0 + aug_uniform(f"{key}|{tag}{i}", -distort_limit, distort_limit)
             for i in range(num_steps)]
        )
        step = n / num_steps
        widths = facs * step                      # distorted cell widths
        edges = np.concatenate([[0.0], np.cumsum(widths)])
        edges *= n / edges[-1]                    # renormalize to [0, n]
        # output position y: find its distorted cell, invert linearly
        pos = np.arange(n, dtype=np.float64)
        cell = np.clip(np.searchsorted(edges, pos, side="right") - 1, 0, num_steps - 1)
        frac = (pos - edges[cell]) / np.maximum(edges[cell + 1] - edges[cell], 1e-9)
        src = (cell + frac) * step
        return np.clip(np.round(src), 0, n - 1).astype(np.int64)

    ys = axis_map(h, "gridy")
    xs = axis_map(w, "gridx")
    return arr[ys][:, xs]


def gaussian_noise(arr: np.ndarray, key: str, var_limit: float = 20.0) -> np.ndarray:
    """albumentations GaussNoise (nougat stage): variance drawn uniform in
    (0, var_limit] via the md5 primitive, the noise field itself from the
    md5-seeded generator — additive, clipped back to u8."""
    var = aug_uniform(key + "|noisevar", 0.0, var_limit)
    noise = _md5_rng(key + "|noisefield").normal(0.0, np.sqrt(var), size=arr.shape)
    return np.clip(np.round(arr.astype(np.float64) + noise), 0, 255).astype(np.uint8)


#: standard JPEG luminance quantization table (ITU-T T.81 Annex K)
_JPEG_Q = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)

_DCT8 = np.array([
    [np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8) * np.cos((2 * n + 1) * k * np.pi / 16)
     for n in range(8)]
    for k in range(8)
])


def jpeg_compress(arr: np.ndarray, key: str, quality_lower: int = 95) -> np.ndarray:
    """albumentations ImageCompression (nougat stage): quality drawn uniform
    in [quality_lower, 100], then a real JPEG luma round trip — 8×8 DCT,
    quantization by the standard table scaled to the drawn quality, inverse
    DCT — in pure numpy (no PIL/cv2 in this environment; the artifact
    *structure* is the real thing, byte-level JPEG entropy coding is not
    needed since the pixels never leave the UDF)."""
    q = aug_uniform(key + "|quality", float(quality_lower), 100.0)
    s = 5000.0 / q if q < 50 else 200.0 - 2.0 * q
    qt = np.clip(np.floor((_JPEG_Q * s + 50.0) / 100.0), 1, 255)
    h, w = arr.shape[:2]
    ph, pw = (-h) % 8, (-w) % 8
    x = np.pad(arr.astype(np.float64), ((0, ph), (0, pw)), mode="edge") - 128.0
    H, W = x.shape
    blocks = x.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
    coef = _DCT8 @ blocks @ _DCT8.T
    coef = np.round(coef / qt) * qt
    rec = _DCT8.T @ coef @ _DCT8
    out = rec.transpose(0, 2, 1, 3).reshape(H, W)[:h, :w] + 128.0
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


#: nougat train-path defaults (ref build_transforms_doc.py:204-233; the
#: scale_range is centered there to become ShiftScaleRotate's scale_limit)
NOUGAT_TRAIN_DEFAULTS = dict(
    bitmap_prob=0.05,
    erosion_dilation_prob=0.02,
    erosion_dilation_scale=(2, 3),
    shear_prob=0.03,
    shear_range_x=(0.0, 3.0),
    shear_range_y=(-3.0, 0.0),
    shift_scale_rotate_prob=0.03,
    shift_range_x=0.04,
    shift_range_y=0.03,
    scale_limit=(0.85 - 1.0, 1.03 - 1.0),
    rotate_range=2.0,
    grid_distort_prob=0.04,
    grid_distort_range=0.05,
    elastic_prob=0.04,
    elastic_alpha=50.0,
    elastic_sigma=12.0,
    brightness_contrast_prob=0.03,
    brightness_range=0.1,
    contrast_range=0.1,
    gaussian_noise_prob=0.08,
    gaussian_noise_range=20.0,
    gaussian_blur_prob=0.03,
    gaussian_blur_kernel=3,
    image_compression_prob=0.1,
    image_compression_quality=95,
)


def nougat_schedule_for(key: str, params: dict = NOUGAT_TRAIN_DEFAULTS) -> dict:
    """Draw schedule for the doc_nougat train pipeline — same md5 primitive
    and naming convention as :func:`aug_schedule_for`; mirrored 1:1 in the
    ``aug_schedule_nougat`` DuckDB oracle."""
    p = params
    return {
        "apply_bitmap": aug_draw(key + "|bitmap?") < p["bitmap_prob"],
        "apply_erode_dilate": aug_draw(key + "|eros?") < p["erosion_dilation_prob"],
        "choose_dilation": aug_draw(key + "|erosdil") < 0.5,
        "kernel": p["erosion_dilation_scale"][0] + int(
            aug_draw(key + "|erosk")
            * (p["erosion_dilation_scale"][1] - p["erosion_dilation_scale"][0] + 1)
        ),
        "apply_shear": aug_draw(key + "|shear?") < p["shear_prob"],
        "shear_x": aug_uniform(key + "|shearx", *p["shear_range_x"]),
        "shear_y": aug_uniform(key + "|sheary", *p["shear_range_y"]),
        "apply_ssr": aug_draw(key + "|ssr?") < p["shift_scale_rotate_prob"],
        "shift_x": aug_uniform(key + "|shiftx", -p["shift_range_x"], p["shift_range_x"]),
        "shift_y": aug_uniform(key + "|shifty", -p["shift_range_y"], p["shift_range_y"]),
        "ssr_scale": 1.0 + aug_uniform(key + "|ssrscale", *p["scale_limit"]),
        "rotate": aug_uniform(key + "|rot", -p["rotate_range"], p["rotate_range"]),
        "apply_grid": aug_draw(key + "|grid?") < p["grid_distort_prob"],
        "apply_elastic": aug_draw(key + "|elastic?") < p["elastic_prob"],
        "elastic_shift": int(aug_draw(key + "|epre") * 6),  # Affine translate_px (0, 5)
        "apply_jitter": aug_draw(key + "|jitter?") < p["brightness_contrast_prob"],
        "brightness": aug_uniform(
            key + "|bright", 1 - p["brightness_range"], 1 + p["brightness_range"]
        ),
        "contrast": aug_uniform(
            key + "|contrast", 1 - p["contrast_range"], 1 + p["contrast_range"]
        ),
        "apply_compress": aug_draw(key + "|compress?") < p["image_compression_prob"],
        "apply_noise": aug_draw(key + "|noise?") < p["gaussian_noise_prob"],
        "apply_blur": aug_draw(key + "|blur?") < p["gaussian_blur_prob"],
        "blur_sigma": aug_uniform(key + "|blursig", 0.1, 0.8),
    }


def doc_nougat_train_transform(
    arr: np.ndarray,
    image_size: tuple[int, int],
    key: str,
    fill: int = 255,
    params: dict = NOUGAT_TRAIN_DEFAULTS,
) -> np.ndarray:
    """The is_training=True pipeline of build_transforms_doc_nougat
    (ref build_transforms_doc.py:177-296), stage order preserved:
    ResizeKeepRatio(longest) → RandomCropOrPad → Bitmap? →
    Erosion|Dilation? → shear Affine? → ShiftScaleRotate? →
    GridDistortion? → (translate + Elastic)? → BrightnessContrast? →
    ImageCompression? → GaussNoise? → GaussianBlur?.  All randomness via
    :func:`nougat_schedule_for` — pixels reproduce on any retry."""
    s = nougat_schedule_for(key, params)
    arr = resize_keep_ratio(arr, max(image_size))
    arr = random_crop_or_pad(arr, image_size, key, fill=fill)
    if s["apply_bitmap"]:
        arr = bitmap(arr)
    if s["apply_erode_dilate"]:
        k = s["kernel"]
        arr = dilation(arr, k) if s["choose_dilation"] else erosion(arr, k)
    if s["apply_shear"]:
        arr = affine_warp(arr, shear_x_deg=s["shear_x"], shear_y_deg=s["shear_y"], fill=fill)
    if s["apply_ssr"]:
        arr = affine_warp(
            arr, rotate_deg=s["rotate"], shift_x=s["shift_x"], shift_y=s["shift_y"],
            scale=s["ssr_scale"], fill=fill,
        )
    if s["apply_grid"]:
        arr = grid_distort(arr, key, params["grid_distort_range"])
    if s["apply_elastic"]:
        d = s["elastic_shift"]
        if d:
            arr = affine_warp(arr, shift_x=d / arr.shape[1], shift_y=d / arr.shape[0],
                              fill=fill)
        arr = elastic_warp(arr, key + "|efield", params["elastic_alpha"],
                           params["elastic_sigma"], fill=fill)
    if s["apply_jitter"]:
        arr = color_jitter(arr, s["brightness"], s["contrast"])
    if s["apply_compress"]:
        arr = jpeg_compress(arr, key, params["image_compression_quality"])
    if s["apply_noise"]:
        arr = gaussian_noise(arr, key, params["gaussian_noise_range"])
    if s["apply_blur"]:
        arr = np.clip(np.round(gaussian_blur(arr, s["blur_sigma"])), 0, 255).astype(np.uint8)
    return arr


def aug_schedule_for(key: str, params: dict = DOC_TRAIN_DEFAULTS) -> dict:
    """The full deterministic draw schedule for one (doc, page) train sample:
    which stages apply and the drawn magnitudes.  Pure md5 math — mirrored
    1:1 in the ``aug_schedule`` DuckDB oracle."""
    p = params
    sched = {
        "apply_scale": aug_draw(key + "|scale?") < p["scale_prob"],
        "scale": aug_uniform(key + "|scale", *p["scale_range"]),
        "apply_ratio": aug_draw(key + "|ratio?") < p["ratio_prob"],
        "ratio": aug_uniform(key + "|ratio", *p["ratio_range"]),
        "apply_bitmap": aug_draw(key + "|bitmap?") < p["bitmap_prob"],
        "apply_erode_dilate": aug_draw(key + "|eros?") < p["erosion_dilation_prob"],
        "choose_dilation": aug_draw(key + "|erosdil") < 0.5,
        "apply_shear": aug_draw(key + "|shear?") < p["shear_prob"],
        "shear_x": aug_uniform(key + "|shearx", *p["shear_range_x"]),
        "shear_y": aug_uniform(key + "|sheary", *p["shear_range_y"]),
        "apply_ssr": aug_draw(key + "|ssr?") < p["shift_scale_rotate_prob"],
        "shift_x": aug_uniform(key + "|shiftx", -p["shift_range_x"], p["shift_range_x"]),
        "shift_y": aug_uniform(key + "|shifty", -p["shift_range_y"], p["shift_range_y"]),
        "rotate": aug_uniform(key + "|rot", -p["rotate_range"], p["rotate_range"]),
        "apply_elastic": aug_draw(key + "|elastic?") < p["elastic_prob"],
        "apply_jitter": aug_draw(key + "|jitter?") < p["brightness_contrast_prob"],
        "brightness": aug_uniform(
            key + "|bright", 1 - p["brightness_range"], 1 + p["brightness_range"]
        ),
        "contrast": aug_uniform(
            key + "|contrast", 1 - p["contrast_range"], 1 + p["contrast_range"]
        ),
        "apply_blur": aug_draw(key + "|blur?") < p["gaussian_blur_prob"],
        "blur_sigma": aug_uniform(key + "|blursig", 0.1, 0.8),
    }
    return sched


def doc_train_transform(
    arr: np.ndarray,
    image_size: tuple[int, int],
    key: str,
    do_crop_margin: bool = True,
    do_align_long_axis: bool = True,
    fill: int = 255,
    params: dict = DOC_TRAIN_DEFAULTS,
) -> np.ndarray:
    """The is_training=True pipeline of build_transforms_doc_better
    (ref build_transforms_doc.py:52-162), stage order preserved:
    CropMargin → AlignLongAxis → ResizeKeepRatio(random scale/aspect) →
    Bitmap? → Erosion|Dilation? → shear affine? → shift/rotate affine? →
    elastic? → brightness/contrast? → blur? → RandomCropOrPad → CenterCrop.
    All randomness via ``aug_schedule_for(key)`` — rerunning any partition
    on any executor reproduces the same pixels."""
    s = aug_schedule_for(key, params)
    if do_crop_margin:
        top, left, ch, cw = crop_margin(arr)
        arr = arr[top : top + ch, left : left + cw]
    if do_align_long_axis:
        arr = align_long_axis(arr, image_size)
    longest = max(image_size)
    if s["apply_scale"]:
        longest = max(1, int(round(longest * s["scale"])))
    arr = resize_keep_ratio(arr, longest)
    if s["apply_ratio"] and arr.shape[0] > 1:
        # aspect jitter: stretch rows by ratio (nearest), width unchanged
        nh = max(1, int(round(arr.shape[0] * s["ratio"])))
        ys = (np.arange(nh) * (arr.shape[0] / nh)).astype(np.int64)
        arr = arr[ys]
    if s["apply_bitmap"]:
        arr = bitmap(arr)
    if s["apply_erode_dilate"]:
        arr = dilation(arr, 3) if s["choose_dilation"] else erosion(arr, 3)
    if s["apply_shear"]:
        arr = affine_warp(arr, shear_x_deg=s["shear_x"], shear_y_deg=s["shear_y"], fill=fill)
    if s["apply_ssr"]:
        arr = affine_warp(
            arr, rotate_deg=s["rotate"], shift_x=s["shift_x"], shift_y=s["shift_y"],
            fill=fill,
        )
    if s["apply_elastic"]:
        arr = elastic_warp(arr, key + "|efield", params["elastic_alpha"],
                           params["elastic_sigma"], fill=fill)
    if s["apply_jitter"]:
        arr = color_jitter(arr, s["brightness"], s["contrast"])
    if s["apply_blur"]:
        arr = np.clip(np.round(gaussian_blur(arr, s["blur_sigma"])), 0, 255).astype(np.uint8)
    arr = random_crop_or_pad(arr, image_size, key, fill=fill)
    return center_crop_or_pad(arr, image_size, fill=fill)


def frame_sample_indices(num_frames: int, every: int) -> list[int]:
    """Deterministic frame sampling for video-like multi-page media."""
    return list(range(0, num_frames, max(1, every)))


def decode_real_media(
    payload: bytes,
    media_type: str,
    image_mode: str = "L",
    render_dpi: int = 96,
    page_indices: list[int] | None = None,
    _pdf_mod=None,
    _pil_mod=None,
):
    """Decoder slot for real image/PDF bytes → list of uint8 numpy arrays.

    Optional-import shim: dispatches to pypdfium2 for PDFs (reference render
    call shape — ``page.render(scale=dpi/72, grayscale=..., rev_byteorder=...)``,
    src/chug/wds/decode.py:99-117) and PIL for (multi-frame) images
    (decode.py:125-164: ``n_frames`` probe, ``seek`` per frame,
    ``convert(image_mode)``).  Neither library ships in this container, so
    the import is lazy and the error message says what to install; tests
    inject fakes via ``_pdf_mod`` / ``_pil_mod`` to lock the dispatch logic
    and call shape.  Returns ``(pages, num_doc_pages)`` like the reference.
    """
    if media_type == "pdf":
        pdf = _pdf_mod
        if pdf is None:
            if importlib.util.find_spec("pypdfium2") is None:
                raise NotImplementedError(
                    "pdf decode needs pypdfium2 (pip install pypdfium2); "
                    "in this sandbox use the synthetic synth:// payload "
                    "format (chug_spark.media)"
                )
            import pypdfium2 as pdf  # type: ignore[no-redef]
        doc = pdf.PdfDocument(payload)
        num_doc_pages = len(doc)
        indices = page_indices if page_indices is not None else range(num_doc_pages)
        # same wrap semantics as the image branch below (i % n_frames): an
        # out-of-range index wraps instead of raising from pypdfium2
        indices = [i % num_doc_pages for i in indices] if num_doc_pages else indices
        pages = []
        for i in indices:
            bitmap = doc[i].render(
                scale=render_dpi / 72,
                grayscale=(image_mode == "L"),
                rev_byteorder=("RGB" in image_mode),
            )
            pil_img = bitmap.to_pil()
            if pil_img.mode != image_mode:
                pil_img = pil_img.convert(image_mode)
            pages.append(np.asarray(pil_img, dtype=np.uint8))
        return pages, num_doc_pages
    if media_type == "image":
        pil = _pil_mod
        if pil is None:
            if importlib.util.find_spec("PIL") is None:
                raise NotImplementedError(
                    "image decode needs Pillow (pip install Pillow); "
                    "in this sandbox use the synthetic synth:// payload "
                    "format (chug_spark.media)"
                )
            from PIL import Image as pil  # type: ignore[no-redef]
        img = pil.open(io.BytesIO(payload))
        num_image_pages = getattr(img, "n_frames", 1)
        indices = (
            [p % num_image_pages for p in page_indices]
            if page_indices is not None
            else range(num_image_pages)
        )
        pages = []
        for i in indices:
            if num_image_pages > 1:
                img.seek(i)
            pages.append(np.asarray(img.convert(image_mode), dtype=np.uint8))
        return pages, num_image_pages
    raise NotImplementedError(
        f"no codec for media_type={media_type!r}; supported: pdf, image"
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


TRAIN_TENSOR_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("applied_bitmap", T.BooleanType()),
        T.StructField("applied_shear", T.BooleanType()),
        T.StructField("applied_jitter", T.BooleanType()),
        T.StructField("applied_blur", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ]
)


def extract_train_tensors(
    docs_media: DataFrame,
    image_size: tuple[int, int] = (96, 128),
    render_dpi: int = 96,
    seed: int = 0,
    variant: str = "better",
) -> DataFrame:
    """Train-path counterpart of :func:`extract_media_features`: render each
    page, run the hash-keyed augmentation pipeline (``variant='better'`` →
    :func:`doc_train_transform`, ``variant='nougat'`` →
    :func:`doc_nougat_train_transform`), emit the tensor stats + which
    stochastic stages actually fired.  Every output is a pure function of
    (doc_id, page, seed) — a retried partition reproduces identical rows,
    which is what makes an augmenting pipeline safe under Spark task
    retries."""
    assert variant in ("better", "nougat"), variant

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in TRAIN_TENSOR_SCHEMA.fields}

            def emit(**kw):
                for k in out:
                    out[k].append(kw.get(k))

            for doc_id, ref in zip(pdf["doc_id"], pdf["media_ref"]):
                try:
                    if not media_mod.is_payload_ref(ref):
                        emit(doc_id=doc_id, media_ref=ref, error="not_decodable")
                        continue
                    _mode, n_pages, pseed = media_mod.parse_payload_ref(ref)
                    for page in range(n_pages):
                        key = f"aug|{doc_id}|{page}|{seed}"
                        arr = media_mod.render_page(pseed, page, "L", render_dpi)
                        if variant == "nougat":
                            s = nougat_schedule_for(key)
                            t = doc_nougat_train_transform(arr, image_size, key)
                        else:
                            s = aug_schedule_for(key)
                            t = doc_train_transform(arr, image_size, key)
                        emit(
                            doc_id=doc_id, media_ref=ref, page=page,
                            height=int(t.shape[0]), width=int(t.shape[1]),
                            mean_px=float(t.mean()),
                            applied_bitmap=bool(s["apply_bitmap"]),
                            applied_shear=bool(s["apply_shear"]),
                            applied_jitter=bool(s["apply_jitter"]),
                            applied_blur=bool(s["apply_blur"]),
                        )
                        del arr, t
                except Exception as exn:
                    emit(doc_id=doc_id, media_ref=ref, error=type(exn).__name__)
            yield pd.DataFrame(out)

    n_parts = int(
        docs_media.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    return (
        docs_media.select("doc_id", "media_ref")
        .repartition(n_parts, "doc_id")
        .mapInPandas(body, schema=TRAIN_TENSOR_SCHEMA)
    )


# ---------------------------------------------------------------------------
# perceptual near-dup hashing (dHash) over decoded media pages
# ---------------------------------------------------------------------------

MEDIA_DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("dhash", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def dhash_bits(arr: "np.ndarray") -> str:
    """64-bit difference hash of a grayscale page: area-average to a 9×8
    grid, bit (r, c) = cell[r][c] > cell[r][c+1], row-major '0'/'1' string.

    The standard perceptual image fingerprint (dHash): invariant to uniform
    brightness shifts and to resolution (block averaging), sensitive to
    content layout — the right cheap key for near-dup *image* dedup where
    byte-level hashing sees every re-encode as a new file.  Pure numpy,
    deterministic; no PIL/interpolation so the value is bit-stable across
    library versions."""
    if arr.ndim == 3:
        arr = np.mean(arr[:, :, :3], axis=2)
    a = arr.astype(np.float64)
    if a.shape[0] < 8:
        a = np.repeat(a, -(-8 // a.shape[0]), axis=0)
    if a.shape[1] < 9:
        a = np.repeat(a, -(-9 // a.shape[1]), axis=1)
    h, w = a.shape
    rows = np.linspace(0, h, 8 + 1, dtype=np.int64)
    cols = np.linspace(0, w, 9 + 1, dtype=np.int64)
    # area sums via two reduceat passes (vectorized grid pooling), then
    # normalize by the per-cell pixel counts — no per-cell python loop
    sums = np.add.reduceat(np.add.reduceat(a, rows[:-1], axis=0), cols[:-1], axis=1)
    counts = np.outer(np.diff(rows), np.diff(cols)).astype(np.float64)
    cells = sums / np.maximum(counts, 1)
    bits = (cells[:, :-1] > cells[:, 1:]).astype(np.uint8).reshape(-1)
    return "".join("1" if b else "0" for b in bits)


def media_dhash(
    docs_media: DataFrame, render_dpi: int = 96, frame_every: int = 1
) -> DataFrame:
    """(doc_id, media_ref) → per-page perceptual dHash rows
    (doc_id, media_ref, page, dhash, error).  Same decode plumbing as
    :func:`extract_media_features` (repartition on doc_id, render → hash →
    drop pixels inside the Arrow batch loop); non-decodable refs produce an
    error row, decode failures keep the pipeline running (whole-sample skip
    is the caller's policy)."""

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in MEDIA_DHASH_SCHEMA.fields}

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
                        emit(
                            doc_id=doc_id,
                            media_ref=ref,
                            page=int(page),
                            dhash=dhash_bits(arr),
                        )
                        del arr
                except Exception as exn:
                    emit(doc_id=doc_id, media_ref=ref,
                         error=f"{type(exn).__name__}: {exn}")
            yield pd.DataFrame(out)

    # explicit partition count: a bare repartition("doc_id") is an
    # AQE-coalescible exchange, and the ref rows are tiny — AQE folds them
    # into ONE partition and the render loop runs serially (measured 3.5 s
    # vs 0.4 s at sf0.1).  The explicit count pins the parallelism the
    # UDF's CPU cost needs, same as extract_media_features.
    n_parts = int(
        docs_media.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    return (
        docs_media.repartition(n_parts, "doc_id")
        .mapInPandas(body, schema=MEDIA_DHASH_SCHEMA)
    )


def media_near_dupes(
    docs_media: DataFrame,
    render_dpi: int = 96,
    max_distance: int = 3,
    bands: int = 4,
    max_bucket_size: int = 64,
) -> DataFrame:
    """Perceptual near-duplicate page pairs: dHash signatures → banded
    Hamming candidate join → exact bit_count verify (the image twin of
    text SimHash dedup, sharing :func:`...dedup.hamming_pairs_from_bits`).
    Returns (doc_a, doc_b, hamming) where each id is 'doc_id:page'."""
    from .dedup import hamming_pairs_from_bits

    sigs = media_dhash(docs_media, render_dpi=render_dpi).filter(
        F.col("error").isNull()
    ).select(
        F.concat_ws(":", "doc_id", F.col("page").cast("string")).alias("doc_id"),
        F.col("dhash").alias("sig"),
    )
    return hamming_pairs_from_bits(
        sigs, sig_col="sig", max_distance=max_distance, bands=bands,
        max_bucket_size=max_bucket_size,
    )
