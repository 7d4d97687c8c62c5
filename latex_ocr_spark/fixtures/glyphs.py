"""Seeded pure-numpy glyph renderer — the fixture stand-in for the reference's
pdflatex + ImageMagick rendering (/root/reference/model/utils/image.py:164-207).

Each vocab token maps to a fixed random-but-deterministic small bitmap; a
formula renders as its token bitmaps concatenated horizontally with spacing on
a white (255) background, at an integer scale factor, as an RGB image (so the
distributed pipeline genuinely exercises the greyscale projection, P1).

Determinism: every bitmap derives from numpy.default_rng(GLYPH_SEED ^ token_id)
— identical across processes/executors, no files shipped.
"""

from __future__ import annotations

import numpy as np

from .vocab import TOK_TO_ID

GLYPH_SEED = 0x5EED_61F9
GLYPH_H = 16
GLYPH_W = 10
GLYPH_GAP = 3
MARGIN = 4


def _token_bitmap(token_id: int) -> np.ndarray:
    """(GLYPH_H, GLYPH_W) uint8 bitmap, dark strokes on white."""
    rng = np.random.default_rng(GLYPH_SEED ^ (token_id * 2654435761 % 2**32))
    img = np.full((GLYPH_H, GLYPH_W), 255, dtype=np.uint8)
    # a handful of random dark strokes — enough structure for crop/encode paths
    for _ in range(6):
        y0, y1 = sorted(rng.integers(0, GLYPH_H, 2).tolist())
        x0, x1 = sorted(rng.integers(0, GLYPH_W, 2).tolist())
        shade = int(rng.integers(0, 140))
        img[y0 : y1 + 1, x0 : x1 + 1] = np.minimum(img[y0 : y1 + 1, x0 : x1 + 1], shade)
    return img


_BITMAP_CACHE: dict[int, np.ndarray] = {}


def token_bitmap(token_id: int) -> np.ndarray:
    bm = _BITMAP_CACHE.get(token_id)
    if bm is None:
        bm = _token_bitmap(token_id)
        _BITMAP_CACHE[token_id] = bm
    return bm


def render_formula(latex: str, scale: int = 1) -> np.ndarray:
    """Render a space-separated LaTeX token string to an RGB uint8 image.

    Unknown tokens render as the _UNK-style hatch (deterministic too).
    An empty formula renders as an all-white image (exercises the crop
    no-content edge case, model/utils/image.py:137-139).
    """
    tokens = [t for t in latex.strip().split(" ") if t]
    h = GLYPH_H + 2 * MARGIN
    if not tokens:
        gray = np.full((h, GLYPH_W + 2 * MARGIN), 255, dtype=np.uint8)
    else:
        w = MARGIN * 2 + len(tokens) * GLYPH_W + (len(tokens) - 1) * GLYPH_GAP
        gray = np.full((h, w), 255, dtype=np.uint8)
        x = MARGIN
        for t in tokens:
            tid = TOK_TO_ID.get(t, -1)
            gray[MARGIN : MARGIN + GLYPH_H, x : x + GLYPH_W] = token_bitmap(
                tid if tid >= 0 else 10_007
            )
            x += GLYPH_W + GLYPH_GAP
    if scale > 1:
        gray = np.repeat(np.repeat(gray, scale, axis=0), scale, axis=1)
    # lift to RGB with slightly different channels so greyscale (P1) is nontrivial
    r = gray
    g = np.clip(gray.astype(np.int32) + 2, 0, 255).astype(np.uint8)
    b = np.clip(gray.astype(np.int32) - 3, 0, 255).astype(np.uint8)
    rgb = np.stack([r, g, b], axis=2)
    # keep true white truly white so crop's !=255 test sees background as blank
    white = gray == 255
    rgb[white] = 255
    return rgb
