"""Natural-image (image_basic/image_timm) transform pipelines."""

from __future__ import annotations

import numpy as np

from chug_spark.ops.image_transforms import (
    AUG_IMAGENET,
    extract_image_tensors,
    image_eval_transform,
    image_train_transform,
    random_resized_crop,
    resize_exact,
    to_tensor_normalize,
)


def _grad(h, w):
    """deterministic test image: row+col gradient"""
    return ((np.arange(h)[:, None] * 3 + np.arange(w)[None, :] * 7) % 256).astype(
        np.uint8
    )


def test_eval_shortest_covers_then_center_crops():
    arr = _grad(100, 50)
    out = image_eval_transform(arr, (40, 40), "shortest")
    assert out.shape == (40, 40)
    # cover scale = min(100/40, 50/40) = 1.25 -> (80, 40): no fill anywhere
    assert (out == 255).mean() < 0.05


def test_eval_longest_fits_then_pads():
    arr = _grad(100, 50)
    out = image_eval_transform(arr, (40, 40), "longest", fill=255)
    assert out.shape == (40, 40)
    # fit scale = max(2.5, 1.25) = 2.5 -> (40, 20): 20 padded columns of fill
    assert (out[:, :10] == 255).all() and (out[:, -10:] == 255).all()
    assert not (out[:, 15:25] == 255).all()


def test_eval_squash_distorts_to_exact():
    arr = _grad(30, 90)
    out = image_eval_transform(arr, (40, 40), "squash")
    assert out.shape == (40, 40)
    # squash keeps every source column family: top-left pixel preserved
    assert out[0, 0] == arr[0, 0]


def test_resize_exact_identity():
    arr = _grad(17, 23)
    assert (resize_exact(arr, (17, 23)) == arr).all()


def test_rrc_deterministic_and_bounded():
    arr = _grad(80, 60)
    out1, box1 = random_resized_crop(arr, (32, 32), "k1")
    out2, box2 = random_resized_crop(arr, (32, 32), "k1")
    assert (out1 == out2).all() and box1 == box2
    top, left, ch, cw = box1
    assert 0 <= top and top + ch <= 80 and 0 <= left and left + cw <= 60
    assert out1.shape == (32, 32)
    _, box3 = random_resized_crop(arr, (32, 32), "k2")
    assert box3 != box1  # different key -> different draw (overwhelmingly)


def test_rrc_unit_scale_is_full_frame():
    """scale=(1,1), ratio=(1,1) on a square image: the only admissible crop
    is the whole frame (the reference's image_basic default aug)."""
    arr = _grad(64, 64)
    _, box = random_resized_crop(arr, (32, 32), "k", (1.0, 1.0), (1.0, 1.0))
    assert box == (0, 0, 64, 64)


def test_train_jitter_applies_only_when_configured():
    arr = _grad(64, 64)
    plain, _ = image_train_transform(arr, (32, 32), "k", dict(scale=(1.0, 1.0),
                                                             ratio=(1.0, 1.0)))
    jit, _ = image_train_transform(arr, (32, 32), "k", dict(scale=(1.0, 1.0),
                                                            ratio=(1.0, 1.0),
                                                            color_jitter=(0.4, 0.4, 0.4)))
    assert plain.shape == jit.shape == (32, 32)
    assert (plain != jit).any()


def test_to_tensor_normalize_range():
    t = to_tensor_normalize(np.array([[0, 255]], dtype=np.uint8))
    assert t.dtype == np.float32
    assert abs(t[0, 0] + 1.0) < 1e-6 and abs(t[0, 1] - 1.0) < 1e-6


def test_extract_image_tensors_spark_parity(spark):
    """The mapInPandas path agrees with direct kernel calls; every eval row
    is exactly image_size; train rows carry an in-bounds rrc box."""
    from chug_spark import media as media_mod

    rows = [("1", "synth://v1/L/2/1", "shortest"),
            ("2", "synth://v1/L/1/2", "longest"),
            ("3", "synth://v1/L/1/3", "squash"),
            ("4", "not-a-ref", "shortest")]
    docs = spark.createDataFrame(rows, "doc_id string, media_ref string, resize_mode string")
    ev = {(r["doc_id"], r["page"]): r
          for r in extract_image_tensors(docs, image_size=(32, 48)).collect()}
    assert ev[("4", None)]["error"] == "not_decodable"
    ok = [r for r in ev.values() if r["error"] is None]
    assert len(ok) == 4  # 2 + 1 + 1 pages
    assert all(r["height"] == 32 and r["width"] == 48 for r in ok)
    # parity for one row against the pure kernels
    arr = media_mod.render_page(media_mod.parse_payload_ref("synth://v1/L/1/2")[2],
                                0, "L", 24)
    want = to_tensor_normalize(image_eval_transform(arr, (32, 48), "longest"))
    got = ev[("2", 0)]
    assert got["t_mean"] == round(float(want.mean()), 6)
    tr = extract_image_tensors(docs, image_size=(32, 48), is_training=True,
                               aug=AUG_IMAGENET).collect()
    for r in tr:
        if r["error"] is None:
            assert r["resize_mode"] == "train"
            assert r["rrc_top"] is not None and r["rrc_h"] > 0
