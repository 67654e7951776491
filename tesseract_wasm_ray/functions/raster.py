"""Deterministic page rasterizer (the fixture-side twin of the recognizer).

Plays the role of the reference's *input images*: the reference tests OCR
on scanned JPEG pages plus in-memory synthetic blanks
(/root/reference/test/ocr-engine-test.js:33-44, test/util.js:18-25).  Our
pages are rendered from known words with the same glyph model the OCR
actor loads, so golden outputs are exact (FIXTURES.md §2).

Layout geometry (all in glyph units, multiplied by integer ``scale``):
glyph cell 5x7, char pitch 6, word gap 4, line pitch 12, page margin 4.
"""

from __future__ import annotations

import numpy as np

from ..state.glyph_model import CHAR_PITCH, GLYPH_H, GLYPH_W, LINE_PITCH, WORD_GAP, GlyphModel

MARGIN = 4

# Luminance bands chosen so Otsu binarization is exact even under seeded
# noise: ink stays <= 90, background stays >= 170.
INK_LO, INK_HI = 0, 90
BG_LO, BG_HI = 170, 255


def line_width_units(words: list[str]) -> int:
    n_chars = sum(len(w) for w in words)
    n_words = len(words)
    return n_chars * CHAR_PITCH - 1 + (n_words - 1) * (WORD_GAP - 1) if n_words else 0


def render_page(
    words_per_line: list[list[str]],
    model: GlyphModel,
    scale: int = 1,
    channels: int = 1,
    noise_rng: np.random.Generator | None = None,
    rotation: int = 0,
) -> np.ndarray:
    """Render lines of words to a uint8 image of shape [H, W] (channels=1)
    or [H, W, 4] (channels=4, RGBA with alpha=255), then rotate by
    ``rotation`` in {0, 90, 180, 270} degrees counter-clockwise.
    """
    if words_per_line:
        width_u = max(line_width_units(ws) for ws in words_per_line)
        height_u = (len(words_per_line) - 1) * LINE_PITCH + GLYPH_H
    else:
        width_u, height_u = 24, 16
    w = (width_u + 2 * MARGIN) * scale
    h = (height_u + 2 * MARGIN) * scale

    ink = np.zeros((h, w), dtype=bool)
    for li, ws in enumerate(words_per_line):
        y0 = (MARGIN + li * LINE_PITCH) * scale
        x_u = MARGIN
        for word in ws:
            for ch in word:
                g = model.templates[model.index(ch)]
                cell = np.repeat(np.repeat(g, scale, axis=0), scale, axis=1)
                x0 = x_u * scale
                ink[y0 : y0 + GLYPH_H * scale, x0 : x0 + GLYPH_W * scale] |= cell
                x_u += CHAR_PITCH
            x_u += WORD_GAP - 1  # last char cell already includes 1 unit of gap

    if noise_rng is not None:
        bg = noise_rng.integers(BG_LO, BG_HI + 1, size=(h, w)).astype(np.uint8)
        fg = noise_rng.integers(INK_LO, INK_HI + 1, size=(h, w)).astype(np.uint8)
    else:
        bg = np.full((h, w), 255, dtype=np.uint8)
        fg = np.zeros((h, w), dtype=np.uint8)
    gray = np.where(ink, fg, bg)

    if rotation:
        gray = np.rot90(gray, k=rotation // 90)
    if channels == 4:
        rgba = np.empty((*gray.shape, 4), dtype=np.uint8)
        rgba[..., 0] = gray
        rgba[..., 1] = gray
        rgba[..., 2] = gray
        rgba[..., 3] = 255
        return rgba
    return gray


def page_text(words_per_line: list[list[str]]) -> str:
    """Ground-truth reading-order text: words joined by spaces, each line
    terminated by \\n (/root/reference/src/lib.cpp:211-214 semantics)."""
    return "".join(" ".join(ws) + "\n" for ws in words_per_line if ws)
