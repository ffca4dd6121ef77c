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


# --- train-path augmentations (D13 is_training=True, hash-keyed draws) ------


def test_doc_train_transform_deterministic_and_sized():
    from chug_spark.ops.media_features import doc_train_transform

    arr = media_mod.render_page(7, 0, "L", 24)
    a = doc_train_transform(arr, (64, 96), "aug|7|0|0")
    b = doc_train_transform(arr.copy(), (64, 96), "aug|7|0|0")
    assert a.shape == (64, 96) and a.dtype == np.uint8
    assert np.array_equal(a, b)  # same key -> identical pixels (retry-safe)
    # a different key flips at least one stochastic stage over a few tries
    diffs = [
        not np.array_equal(a, doc_train_transform(arr, (64, 96), f"aug|7|0|{s}"))
        for s in range(1, 6)
    ]
    assert any(diffs)


def test_random_crop_or_pad_bounds():
    from chug_spark.ops.media_features import random_crop_or_pad

    big = np.arange(30 * 40, dtype=np.uint8).reshape(30, 40) % 200
    out = random_crop_or_pad(big, (10, 12), "k1")
    assert out.shape == (10, 12)
    small = np.zeros((4, 5), dtype=np.uint8)
    out2 = random_crop_or_pad(small, (10, 12), "k1", fill=255)
    assert out2.shape == (10, 12)
    assert (out2 == 0).sum() == 20 and (out2 == 255).sum() == 100
    assert np.array_equal(out, random_crop_or_pad(big, (10, 12), "k1"))


def test_affine_warp_identity_and_fill():
    from chug_spark.ops.media_features import affine_warp

    arr = np.arange(100, dtype=np.uint8).reshape(10, 10)
    assert np.array_equal(affine_warp(arr), arr)  # zero params = identity
    rot = affine_warp(arr, rotate_deg=90.0, fill=7)
    assert rot.shape == arr.shape and rot.dtype == arr.dtype
    shifted = affine_warp(arr, shift_x=0.5, fill=7)
    assert (shifted[:, :4] == 7).all()  # vacated half is fill


def test_color_jitter_identity_and_clip():
    from chug_spark.ops.media_features import color_jitter

    arr = np.array([[0, 128, 255]], dtype=np.uint8)
    assert np.array_equal(color_jitter(arr, 1.0, 1.0), arr)
    bright = color_jitter(arr, 2.0, 1.0)
    assert bright.max() == 255 and bright.dtype == np.uint8


def test_gaussian_blur_constant_invariant():
    from chug_spark.ops.media_features import gaussian_blur

    const = np.full((20, 20), 80.0)
    out = gaussian_blur(const, 0.5)
    assert np.allclose(out, 80.0)
    # blur shrinks the range of a step image
    step = np.zeros((20, 20)); step[:, 10:] = 255.0
    blurred = gaussian_blur(step, 0.5)
    assert 0 < blurred[5, 10] < 255


def test_elastic_warp_deterministic():
    from chug_spark.ops.media_features import elastic_warp

    arr = media_mod.render_page(3, 0, "L", 24)
    a = elastic_warp(arr, "e1")
    assert a.shape == arr.shape
    assert np.array_equal(a, elastic_warp(arr, "e1"))
    assert not np.array_equal(a, elastic_warp(arr, "e2"))


def test_train_tensor_flags_match_sql_schedule(spark):
    """The flags the pixel UDF reports must equal the Column-expression
    schedule that the aug_schedule oracle query verifies — i.e. the UDF
    really consumes the SQL-checkable draws."""
    from pyspark.sql import functions as F

    from chug_spark.ops.entry import q_aug_schedule
    from chug_spark.ops.media_features import extract_train_tensors

    import os
    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("testdata missing")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    fixture = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(
            F.lit(media_mod.SYNTH_PREFIX), F.lit("L/"),
            (F.pmod(F.col("doc_id"), F.lit(4)) + 1).cast("string"),
            F.lit("/"), F.col("doc_id").cast("string"),
        ).alias("media_ref"),
    )
    udf_flags = {
        (r["doc_id"], r["page"]): r["applied_bitmap"]
        for r in extract_train_tensors(fixture, (32, 48), render_dpi=12).collect()
        if r["error"] is None
    }
    sched = {
        (str(r["doc_id"]), r["page"]): r["apply_bitmap"]
        for r in q_aug_schedule(spark, sf_dir).collect()
    }
    assert udf_flags and all(
        sched[k] == v for k, v in udf_flags.items()
    )


def test_nougat_kernels_deterministic_and_shaped():
    """grid_distort / gaussian_noise / jpeg_compress: deterministic in the
    key, shape-preserving, and actually perturbing."""
    import numpy as np

    from chug_spark.ops.media_features import (
        gaussian_noise,
        grid_distort,
        jpeg_compress,
    )

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(40, 56), dtype=np.uint8)
    for fn in (lambda a: grid_distort(a, "k1", 0.05),
               lambda a: gaussian_noise(a, "k1", 20.0),
               lambda a: jpeg_compress(a, "k1", 95)):
        out1, out2 = fn(arr), fn(arr)
        assert out1.shape == arr.shape and out1.dtype == np.uint8
        assert (out1 == out2).all()          # determinism
        assert (out1 != arr).any()           # it did something
    # different key -> different noise field
    assert (gaussian_noise(arr, "k1", 20.0) != gaussian_noise(arr, "k2", 20.0)).any()


def test_jpeg_compress_quality_monotone():
    """Higher quality -> smaller reconstruction error (DCT quantization is a
    real JPEG luma round trip, not an arbitrary perturbation)."""
    import numpy as np

    from chug_spark.ops.media_features import _DCT8, _JPEG_Q, jpeg_compress

    # orthonormality of the DCT basis
    assert np.allclose(_DCT8 @ _DCT8.T, np.eye(8), atol=1e-12)
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)

    def err_at(q):
        import chug_spark.ops.media_features as mf

        # fix the drawn quality by monkey-keying: draw from [q, q]
        out = mf.jpeg_compress(arr, "kq", quality_lower=q)
        return np.abs(out.astype(int) - arr.astype(int)).mean()

    # quality_lower=100 forces q=100 (draw range [100,100])
    assert err_at(100) < err_at(95) < err_at(60)


def test_doc_nougat_train_transform_sized_and_deterministic():
    import numpy as np

    from chug_spark.ops.media_features import (
        NOUGAT_TRAIN_DEFAULTS,
        doc_nougat_train_transform,
        nougat_schedule_for,
    )

    arr = media_mod.render_page(7, 0, "L", 24)
    out1 = doc_nougat_train_transform(arr, (64, 96), "aug|x|0|0")
    out2 = doc_nougat_train_transform(arr, (64, 96), "aug|x|0|0")
    assert out1.shape == (64, 96) and (out1 == out2).all()

    # force-all-stages params: every stage applies and output is still sized
    p = dict(NOUGAT_TRAIN_DEFAULTS)
    for k in list(p):
        if k.endswith("_prob"):
            p[k] = 1.1
    s = nougat_schedule_for("aug|x|0|0", p)
    assert all(v for k, v in s.items() if k.startswith("apply_"))
    out3 = doc_nougat_train_transform(arr, (64, 96), "aug|x|0|0", params=p)
    assert out3.shape == (64, 96)
    assert (out3 != out1).any()


def test_nougat_train_tensor_flags_match_schedule(spark):
    """The applied_* flags coming out of the nougat mapInPandas leg equal
    the pure-Python schedule — the UDF consumes exactly these draws."""
    from chug_spark.ops.media_features import extract_train_tensors, nougat_schedule_for

    refs = spark.createDataFrame(
        [(str(i), f"synth://v1/L/2/{i}") for i in range(8)],
        "doc_id string, media_ref string",
    )
    rows = extract_train_tensors(
        refs, image_size=(32, 48), render_dpi=12, variant="nougat"
    ).collect()
    assert len(rows) == 16
    for r in rows:
        s = nougat_schedule_for(f"aug|{r['doc_id']}|{r['page']}|0")
        assert r["applied_bitmap"] == s["apply_bitmap"]
        assert r["applied_shear"] == s["apply_shear"]
        assert r["applied_jitter"] == s["apply_jitter"]
        assert r["applied_blur"] == s["apply_blur"]
        assert (r["height"], r["width"]) == (32, 48)
