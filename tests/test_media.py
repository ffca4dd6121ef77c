"""Synthetic media format + decode semantics (reference wds/decode.py)."""

import numpy as np
import pytest

from chug_spark import media as m


def test_payload_ref_roundtrip():
    ref = m.make_payload_ref("RGB", 7, 123)
    assert m.is_payload_ref(ref)
    assert m.parse_payload_ref(ref) == ("RGB", 7, 123)
    assert m.page_count(ref) == 7


def test_payload_ref_corrupt():
    with pytest.raises(ValueError):
        m.parse_payload_ref(m.SYNTH_PREFIX + "L/not_a_number")
    with pytest.raises(ValueError):
        m.parse_payload_ref(m.SYNTH_PREFIX + "XYZ/3/1")
    with pytest.raises(ValueError):
        m.parse_payload_ref(m.SYNTH_PREFIX + "L/0/1")   # zero pages → corrupt
    with pytest.raises(ValueError):
        m.make_payload_ref("BGR", 1, 0)


def test_render_deterministic_and_dpi_scale():
    a = m.render_page(5, 0, "L", 36)
    b = m.render_page(5, 0, "L", 36)
    assert (a == b).all()
    # scale = dpi/72 (decode.py:109): 36 dpi → half of 612×792
    assert a.shape == (396, 306)
    c = m.render_page(5, 1, "L", 36)
    assert m.content_ref(a) != m.content_ref(c)     # pages differ
    assert m.content_ref(a).startswith("sha1:")


def test_decode_index_wrap_and_negative():
    """page_indices wrap p % num_pages incl. negative indexing
    (decode.py:65, :142)."""
    ref = m.make_payload_ref("L", 3, 9)
    refs_all, n = m.decode_media_pages(ref, page_indices=None, render_dpi=18)
    assert n == 3 and len(refs_all) == 3
    wrapped, _ = m.decode_media_pages(ref, page_indices=[4, -1], render_dpi=18)
    assert wrapped[0] == refs_all[1]   # 4 % 3 = 1
    assert wrapped[1] == refs_all[2]   # -1 % 3 = 2


def test_decode_passthrough_preresolved():
    refs, n = m.decode_media_pages("page:abc", page_indices=[0, 1])
    assert refs == ["page:abc", "page:abc"] and n == 1


def test_convert_mode_semantics():
    """Channel conversions mirror decode.py:260-278."""
    gray = np.array([[10, 200]], dtype=np.uint8)
    rgb = m.convert_mode(gray, "RGB")
    assert rgb.shape == (1, 2, 3) and (rgb[..., 0] == gray).all()
    rgba = m.convert_mode(gray, "RGBA")
    assert rgba.shape == (1, 2, 4) and (rgba[..., 3] == 255).all()
    back = m.convert_mode(rgba, "RGB")
    assert back.shape == (1, 2, 3)
    l_again = m.convert_mode(rgb, "L")
    assert (l_again == gray).all()      # mean of identical channels


def test_imagespec_table():
    assert m.parse_imagespec("pill") == ("pil", None, "L")
    assert m.parse_imagespec("torchrgb8") == ("torch", "uint8", "RGB")
    assert m.parse_imagespec("l") == ("numpy", "float", "L")
    assert m.parse_imagespec("RGB8") == ("numpy", "uint8", "RGB")  # lowercased
    with pytest.raises(ValueError, match="Unknown imagespec"):
        m.parse_imagespec("bogus")


def test_apply_etype_float_normalize():
    arr = np.array([[0, 255]], dtype=np.uint8)
    out = m.apply_etype(arr, "float")
    assert out.dtype == np.float32 and out[0, 1] == 1.0
    assert m.apply_etype(arr, "uint8") is arr
