"""Synthetic deterministic media format + page decoders.

The sandbox has no pypdfium2/PIL (SURVEY.md §7.0), so media payloads use a
self-describing deterministic reference format that exercises the same decode
semantics as the reference's PDF/TIFF paths (``src/chug/wds/decode.py:49-164``):

- page-count discovery         (decode.py:103 ``len(doc)`` / :137 ``n_frames``)
- page-index wrap ``p % n``    (decode.py:65, :142 — negative/overflow wrap)
- page sampling first/last/random  (decode.py:224-233)
- mode conversion L/RGB/RGBA   (decode.py:260-278 numpy channel logic)
- render scale = dpi/72        (decode.py:109)

Payload reference grammar (all fields deterministic, no external bytes)::

    synth://v1/<mode>/<num_pages>/<seed>

"Rendering" a page produces a numpy uint8 array whose content is a pure
function of ``(seed, page_index, dpi, mode)``; the page's stable output
reference is ``sha1:<hex16>`` of the rendered bytes.  Pre-resolved references
(anything not starting with ``synth://``) pass through decode unchanged —
the analogue of an already-decoded image member in a wds sample.
"""

from __future__ import annotations

import hashlib

import numpy as np

SYNTH_PREFIX = "synth://v1/"

# US-Letter points, the page geometry pypdfium2 renders at scale=dpi/72
# (reference src/chug/wds/decode.py:105-113).
PAGE_W_PT = 612
PAGE_H_PT = 792

_MODE_CHANNELS = {"L": 1, "RGB": 3, "RGBA": 4}


# imagespec table (reference src/chug/wds/decode.py:180-199 docstring):
# spec → (array type, element type, mode)
IMAGESPECS = {
    "l8": ("numpy", "uint8", "L"),
    "rgb8": ("numpy", "uint8", "RGB"),
    "rgba8": ("numpy", "uint8", "RGBA"),
    "l": ("numpy", "float", "L"),
    "rgb": ("numpy", "float", "RGB"),
    "rgba": ("numpy", "float", "RGBA"),
    "torchl8": ("torch", "uint8", "L"),
    "torchrgb8": ("torch", "uint8", "RGB"),
    "torchrgba8": ("torch", "uint8", "RGBA"),
    "torchl": ("torch", "float", "L"),
    "torchrgb": ("torch", "float", "RGB"),
    "torch": ("torch", "float", "RGB"),
    "torchrgba": ("torch", "float", "RGBA"),
    "pill": ("pil", None, "L"),
    "pil": ("pil", None, "RGB"),
    "pilrgb": ("pil", None, "RGB"),
    "pilrgba": ("pil", None, "RGBA"),
}


def parse_imagespec(spec: str) -> tuple[str, str | None, str]:
    """imagespec → (atype, etype, mode); ValueError on unknown spec
    (reference DecodeDoc.__init__, wds/decode.py:201-205)."""
    try:
        return IMAGESPECS[spec.lower()]
    except KeyError:
        raise ValueError(f"Unknown imagespec: {spec}")


def apply_etype(arr: np.ndarray, etype: str | None) -> np.ndarray:
    """uint8/float element conversion (float = /255.0, decode.py:257-258)."""
    if etype == "float":
        return arr.astype(np.float32) / 255.0
    return arr


def make_payload_ref(mode: str, num_pages: int, seed: int) -> str:
    """Build a synthetic payload reference (the stand-in for pdf/tiff bytes)."""
    if mode not in _MODE_CHANNELS:
        raise ValueError(f"unsupported media mode {mode!r}")
    if num_pages < 1:
        raise ValueError("num_pages must be >= 1")
    return f"{SYNTH_PREFIX}{mode}/{num_pages}/{seed}"


def is_payload_ref(media_ref: str | None) -> bool:
    return bool(media_ref) and media_ref.startswith(SYNTH_PREFIX)


def parse_payload_ref(media_ref: str) -> tuple[str, int, int]:
    """Parse ``synth://v1/<mode>/<num_pages>/<seed>`` → (mode, num_pages, seed).

    Raises ValueError on malformed payloads — the analogue of a corrupt
    PDF/TIFF byte stream (exercises the error-handler path,
    reference src/chug/wds/helpers.py:41-68).
    """
    if not is_payload_ref(media_ref):
        raise ValueError(f"not a synthetic media payload: {media_ref!r}")
    body = media_ref[len(SYNTH_PREFIX):]
    parts = body.split("/")
    if len(parts) != 3:
        raise ValueError(f"malformed media payload: {media_ref!r}")
    mode, num_pages_s, seed_s = parts
    if mode not in _MODE_CHANNELS:
        raise ValueError(f"unsupported media mode {mode!r} in {media_ref!r}")
    num_pages = int(num_pages_s)
    seed = int(seed_s)
    if num_pages < 1:
        raise ValueError(f"corrupt media payload (num_pages={num_pages})")
    return mode, num_pages, seed


def page_count(media_ref: str) -> int:
    """Page-count discovery (decode.py:103 / :137)."""
    return parse_payload_ref(media_ref)[1]


#: (h, w) -> cached uint8 coordinate ramps for render_page's gradient
_COORD_RAMPS: dict = {}


def render_page(
    seed: int,
    page_index: int,
    image_mode: str = "L",
    render_dpi: int = 144,
) -> np.ndarray:
    """Render one page deterministically → uint8 array (H, W[, C]).

    Pixel content is a cheap but non-trivial numpy computation so the decode
    UDF has realistic per-page CPU cost (the role pypdfium2's rasterizer plays
    in the reference, decode.py:105-113).
    """
    scale = render_dpi / 72.0
    w = max(1, int(PAGE_W_PT * scale))
    h = max(1, int(PAGE_H_PT * scale))
    rng = np.random.default_rng(np.uint64((seed * 1_000_003 + page_index) & 0xFFFFFFFFFFFFFFFF))
    page = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    # deterministic "content": gradient + seeded noise, like rendered glyphs.
    # In-place uint8 adds with natural wraparound — bit-identical to the
    # original ((base_u16 + yy + xx) % 256) formulation (the mod-256 of a
    # sum is the low byte, i.e. uint8 overflow addition) at a quarter of
    # the memory traffic (r6: 4.0 → 1.0 ms/page, pixel hashes unchanged);
    # the coordinate ramps are pure functions of (h, w) and cached.
    key = (h, w)
    ramps = _COORD_RAMPS.get(key)
    if ramps is None:
        ramps = _COORD_RAMPS[key] = (
            (np.arange(h, dtype=np.uint16)[:, None] % 256).astype(np.uint8),
            (np.arange(w, dtype=np.uint16)[None, :] % 256).astype(np.uint8),
        )
    page += ramps[0]
    page += ramps[1]
    return convert_mode(page, image_mode)


def convert_mode(arr: np.ndarray, image_mode: str) -> np.ndarray:
    """L/RGB/RGBA channel conversion, numpy semantics mirroring the
    reference's imagespec post-processing (src/chug/wds/decode.py:260-278)."""
    if image_mode == "L":
        if arr.ndim == 3:
            arr = np.mean(arr[:, :, :3], axis=2).astype(np.uint8)
        return arr
    if image_mode == "RGB":
        if arr.ndim == 2:
            return np.repeat(arr[:, :, np.newaxis], 3, axis=2)
        if arr.shape[2] == 4:
            return arr[:, :, :3]
        return arr
    if image_mode == "RGBA":
        if arr.ndim == 2:
            out = np.repeat(arr[:, :, np.newaxis], 4, axis=2)
            out[:, :, 3] = 255
            return out
        if arr.shape[2] == 3:
            alpha = np.full(arr.shape[:2] + (1,), 255, dtype=np.uint8)
            return np.concatenate([arr, alpha], axis=2)
        return arr
    raise ValueError(f"unsupported image_mode {image_mode!r}")


def content_ref(arr: np.ndarray) -> str:
    """Stable reference for a rendered page: sha1 of shape+bytes, 16 hex chars."""
    hsh = hashlib.sha1()
    hsh.update(str(arr.shape).encode())
    hsh.update(arr.tobytes())
    return "sha1:" + hsh.hexdigest()[:16]


def decode_media_pages(
    media_ref: str,
    image_mode: str = "L",
    page_indices: list[int] | None = None,
    render_dpi: int = 144,
) -> tuple[list[str], int]:
    """Decode selected pages of a media payload → (page refs, num_doc_pages).

    Mirrors ``decode_pdf_pages``/``decode_image_pages`` (reference
    src/chug/wds/decode.py:49-164): page indices wrap ``p % num_pages``
    (supports negative indexing, decode.py:65/:142); ``page_indices=None``
    decodes every page.  Pixels are rendered, hashed into a stable
    ``sha1:`` reference, and dropped immediately — raw pixel buffers never
    leave the decode loop (memory bound, SURVEY.md §7.4.5).

    Pre-resolved (non-``synth://``) references are returned as single-page
    passthrough — the already-decoded-image case.
    """
    if not is_payload_ref(media_ref):
        # pre-resolved single-page media: passthrough, 1 page
        if page_indices is not None and any(p % 1 != 0 for p in page_indices):
            raise ValueError("bad page index")
        n = 1 if page_indices is None else len(page_indices)
        return [media_ref] * max(n, 1), 1

    mode_in, num_pages, seed = parse_payload_ref(media_ref)
    if page_indices is None:
        indices = list(range(num_pages))
    else:
        indices = [p % num_pages for p in page_indices]
    refs = []
    for i in indices:
        arr = render_page(seed, i, image_mode=image_mode, render_dpi=render_dpi)
        refs.append(content_ref(arr))
        del arr
    return refs, num_pages
