"""Optional-import shims: hf:// source, real-codec decode, HF tokenizer.

None of datasets/pypdfium2/PIL/transformers ship in this sandbox, so each
shim's *dispatch* logic is locked with an injected fake module; the real
import path is asserted to fail with a message naming the missing library.
"""

from __future__ import annotations

import importlib.util
import types

import numpy as np
import pytest

import chug_spark  # noqa: F401  (registers the hf:// scheme)
from chug_spark.ops.media_features import decode_real_media
from chug_spark.sources.hf import (
    disable_decode,
    hf_to_dataframe,
    parse_hf_locator,
)
from chug_spark.sources.registry import registered_schemes
from chug_spark.text.tokenization import hf_tokenizer_factory, make_tokenize_udf


# ---------------------------------------------------------------------------
# hf:// source
# ---------------------------------------------------------------------------


def test_hf_scheme_registered():
    assert "hf" in registered_schemes()


def test_parse_hf_locator():
    assert parse_hf_locator("org/name") == ("org/name", "train", None)
    assert parse_hf_locator("org/name#validation") == ("org/name", "validation", None)
    assert parse_hf_locator("org/name#test?limit=50") == ("org/name", "test", 50)
    with pytest.raises(ValueError):
        parse_hf_locator("org/name?unknown=1")


class _FakeImage:
    def __init__(self):
        self.decode = True


class _FakeAudio:
    def __init__(self):
        self.decode = True


class _FakeSplit:
    def __init__(self, rows, features):
        self._rows = rows
        self.features = features
        self.casts = []

    def cast_column(self, k, d):
        self.casts.append((k, d))
        return self

    def __iter__(self):
        return iter(self._rows)


def _fake_datasets_mod(rows, features):
    split = _FakeSplit(rows, features)
    mod = types.SimpleNamespace(
        Image=_FakeImage,
        Audio=_FakeAudio,
        load_dataset=lambda name, streaming: {"train": split, "validation": split},
    )
    return mod, split


def test_disable_decode_casts_media_features():
    rows = [{"doc_id": "a", "image": b"x"}]
    features = {"doc_id": "plain", "image": _FakeImage(), "audio": _FakeAudio()}
    mod, split = _fake_datasets_mod(rows, features)
    disable_decode(split, mod)
    cast_keys = {k for k, _ in split.casts}
    assert cast_keys == {"image", "audio"}
    assert all(d.decode is False for _, d in split.casts)


def test_hf_to_dataframe_with_fake_module(spark):
    rows = [{"doc_id": f"d{i}", "text": f"t{i}"} for i in range(7)]
    mod, _ = _fake_datasets_mod(rows, {"doc_id": "plain"})
    df = hf_to_dataframe(spark, "org/name#validation?limit=5", datasets_mod=mod)
    got = sorted(r["doc_id"] for r in df.collect())
    assert got == ["d0", "d1", "d2", "d3", "d4"]  # limit applied


def test_hf_missing_split_raises(spark):
    mod, _ = _fake_datasets_mod([{"a": 1}], {})
    with pytest.raises(KeyError, match="nope"):
        hf_to_dataframe(spark, "org/name#nope", datasets_mod=mod)


@pytest.mark.skipif(
    importlib.util.find_spec("datasets") is not None,
    reason="datasets installed — real path available",
)
def test_hf_absent_raises_importerror(spark):
    with pytest.raises(ImportError, match="datasets"):
        hf_to_dataframe(spark, "org/name")


# ---------------------------------------------------------------------------
# decode_real_media
# ---------------------------------------------------------------------------


class _FakePixmap:
    def __init__(self, arr):
        self._arr = arr
        self.mode = "L"

    def to_pil(self):
        return self

    def convert(self, mode):
        return self

    def __array__(self, dtype=None, copy=None):
        return self._arr.astype(dtype or np.uint8)


class _FakePage:
    def __init__(self, arr):
        self._arr = arr
        self.render_calls = []

    def render(self, scale, grayscale, rev_byteorder):
        self.render_calls.append((scale, grayscale, rev_byteorder))
        return _FakePixmap(self._arr)


class _FakePdfDoc:
    def __init__(self, pages):
        self._pages = pages

    def __len__(self):
        return len(self._pages)

    def __getitem__(self, i):
        return self._pages[i]


def test_decode_real_media_pdf_dispatch():
    pages = [_FakePage(np.full((4, 4), v, dtype=np.uint8)) for v in (10, 20, 30)]
    pdf_mod = types.SimpleNamespace(PdfDocument=lambda payload: _FakePdfDoc(pages))
    out, n = decode_real_media(
        b"%PDF", "pdf", image_mode="L", render_dpi=144, _pdf_mod=pdf_mod
    )
    assert n == 3 and len(out) == 3
    assert out[0][0, 0] == 10 and out[2][0, 0] == 30
    # reference render call shape: scale=dpi/72, grayscale for L mode
    assert pages[0].render_calls == [(2.0, True, False)]
    # page_indices subset
    out2, n2 = decode_real_media(
        b"%PDF", "pdf", page_indices=[1], _pdf_mod=pdf_mod
    )
    assert n2 == 3 and len(out2) == 1 and out2[0][0, 0] == 20


class _FakePilImage:
    def __init__(self, frames):
        self._frames = frames
        self.n_frames = len(frames)
        self._pos = 0

    def seek(self, i):
        self._pos = i

    def convert(self, mode):
        return self._frames[self._pos]


def test_decode_real_media_image_dispatch():
    frames = [np.full((2, 2), v, dtype=np.uint8) for v in (1, 2, 3)]
    pil_mod = types.SimpleNamespace(open=lambda fh: _FakePilImage(frames))
    out, n = decode_real_media(b"IMG", "image", _pil_mod=pil_mod)
    assert n == 3 and [a[0, 0] for a in out] == [1, 2, 3]
    # negative index wraps (reference decode.py:142)
    out2, _ = decode_real_media(b"IMG", "image", page_indices=[-1], _pil_mod=pil_mod)
    assert out2[0][0, 0] == 3


def test_decode_real_media_absent_libs_raise():
    if importlib.util.find_spec("pypdfium2") is None:
        with pytest.raises(NotImplementedError, match="pypdfium2"):
            decode_real_media(b"%PDF", "pdf")
    if importlib.util.find_spec("PIL") is None:
        with pytest.raises(NotImplementedError, match="Pillow"):
            decode_real_media(b"IMG", "image")
    with pytest.raises(NotImplementedError, match="video"):
        decode_real_media(b"x", "video")


# ---------------------------------------------------------------------------
# hf_tokenizer_factory
# ---------------------------------------------------------------------------


def test_hf_tokenizer_factory_with_fake_module(spark):
    # defined in-function so cloudpickle ships it by value to the workers
    # (the tests dir is not an importable package on executors)
    class _FakeTokenizer:
        def __call__(self, texts, add_special_tokens, max_length, padding, truncation):
            assert add_special_tokens is False
            assert padding == "max_length" and truncation is True
            return {
                "input_ids": [
                    ([len(t)] * min(len(t), max_length) + [0] * max_length)[:max_length]
                    for t in texts
                ]
            }

    fake = types.SimpleNamespace(
        AutoTokenizer=types.SimpleNamespace(
            from_pretrained=lambda name, **kw: _FakeTokenizer()
        )
    )
    factory = hf_tokenizer_factory("gpt2", _transformers_mod=fake)
    tok_udf = make_tokenize_udf(factory, max_length=4)
    df = spark.createDataFrame([("ab",), ("abcdef",)], ["text"])
    rows = {r["text"]: r["ids"] for r in df.select("text", tok_udf("text").alias("ids")).collect()}
    assert rows["ab"] == [2, 2, 0, 0]
    assert rows["abcdef"] == [6, 6, 6, 6]


@pytest.mark.skipif(
    importlib.util.find_spec("transformers") is not None,
    reason="transformers installed — real path available",
)
def test_hf_tokenizer_factory_absent_raises():
    with pytest.raises(ImportError, match="transformers"):
        hf_tokenizer_factory("gpt2")
