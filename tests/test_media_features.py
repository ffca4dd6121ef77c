"""Multimodal feature-extraction plumbing + deterministic image transforms
(reference eval-path semantics, src/chug/image/transforms_torch.py)."""

import numpy as np
import pytest

from chug_spark import media as media_mod
from chug_spark.ops.media_features import (
    bitmap,
    crop_margin,
    dilation,
    erosion,
    extract_media_features,
    frame_sample_indices,
    resize_keep_ratio,
)


def test_bitmap_threshold():
    # reference LUT keeps values >= threshold (transforms_torch.py:29-38)
    arr = np.array([[0, 199, 200, 255]], dtype=np.uint8)
    assert bitmap(arr).tolist() == [[0, 0, 200, 255]]


def test_align_long_axis_rotates_on_mismatch():
    from chug_spark.ops.media_features import align_long_axis

    landscape = np.arange(6, dtype=np.uint8).reshape(2, 3)
    # portrait target + landscape image → rotate 90 cw (dims swap)
    out = align_long_axis(landscape, (30, 20))
    assert out.shape == (3, 2)
    # rotate(-90) clockwise: first row of input becomes last column
    assert out[:, 1].tolist() == [0, 1, 2]
    # matching orientation → untouched
    assert align_long_axis(landscape, (20, 30)).shape == (2, 3)


def test_center_crop_or_pad_both_directions():
    from chug_spark.ops.media_features import center_crop_or_pad

    arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    padded = center_crop_or_pad(arr, (6, 6), fill=9)
    assert padded.shape == (6, 6)
    assert padded[0].tolist() == [9] * 6 and padded[1, 1] == arr[0, 0]
    cropped = center_crop_or_pad(arr, (2, 2))
    assert cropped.tolist() == [[5, 6], [9, 10]]


def test_doc_eval_transform_output_size_invariant():
    from chug_spark.ops.media_features import doc_eval_transform

    rng = np.random.default_rng(5)
    for shape in [(40, 90), (90, 40), (10, 10), (200, 37)]:
        arr = (rng.random(shape) * 255).astype(np.uint8)
        out = doc_eval_transform(arr, (64, 48))
        assert out.shape == (64, 48)
    # deterministic
    a = doc_eval_transform(arr, (64, 48))
    b = doc_eval_transform(arr.copy(), (64, 48))
    assert (a == b).all()


def test_erosion_dilation():
    arr = np.full((5, 5), 255, dtype=np.uint8)
    arr[2, 2] = 0
    er = erosion(arr, k=3)
    assert (er[1:4, 1:4] == 0).all()          # min-pool spreads the dark px
    assert er[0, 0] == 255
    di = dilation(er, k=3)
    assert di[2, 2] == 0 or di[0, 0] == 255   # max-pool shrinks it back


def test_crop_margin_box():
    arr = np.full((10, 8), 255, dtype=np.uint8)
    arr[3:6, 2:5] = 0
    assert crop_margin(arr) == (3, 2, 3, 3)
    blank = np.full((4, 4), 255, dtype=np.uint8)
    assert crop_margin(blank) == (0, 0, 4, 4)  # no content → full frame


def test_resize_keep_ratio():
    arr = np.arange(200 * 100, dtype=np.uint8).reshape(200, 100)
    out = resize_keep_ratio(arr, 50)
    assert out.shape == (50, 25)


def test_frame_sampling():
    assert frame_sample_indices(10, 3) == [0, 3, 6, 9]
    assert frame_sample_indices(2, 1) == [0, 1]


def test_extract_media_features_pipeline(spark):
    rows = [
        ("d1", media_mod.make_payload_ref("L", 3, 42)),
        ("d2", media_mod.make_payload_ref("RGB", 2, 43)),
        ("d3", "page:pre-resolved"),          # not decodable → error row
        ("d4", media_mod.SYNTH_PREFIX + "L/bad"),  # corrupt → error row
    ]
    df = spark.createDataFrame(rows, "doc_id string, media_ref string")
    out = extract_media_features(df, render_dpi=24, frame_every=2, resize_longest=64)
    got = out.collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc["d1"]) == 2              # pages 0, 2 (frame_every=2)
    assert by_doc["d1"][0]["height"] <= 64 and by_doc["d1"][0]["width"] <= 64
    assert all(r["error"] is None for r in by_doc["d1"])
    assert 0.0 <= by_doc["d1"][0]["ink_ratio"] <= 1.0
    assert by_doc["d3"][0]["error"] == "not_decodable"
    assert by_doc["d4"][0]["error"] == "ValueError"
    # deterministic across partitionings
    again = extract_media_features(df.repartition(5), render_dpi=24,
                                   frame_every=2, resize_longest=64).collect()
    key = lambda r: (r["doc_id"], r["page"] if r["page"] is not None else -1)
    assert sorted(map(tuple, got), key=lambda t: (t[0], t[2] or -1)) == \
           sorted(map(tuple, again), key=lambda t: (t[0], t[2] or -1))
