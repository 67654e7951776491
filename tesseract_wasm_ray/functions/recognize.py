"""Glyph recognition: template matching over segmented word boxes.

From-scratch analogue of the reference's recognition path
(``getTextBoxes`` -> ``Recognize`` + page-iterator walk,
/root/reference/src/ocr-engine.ts:255-267, /root/reference/src/lib.cpp:291-336):
produces per-word/per-line TextItems {rect, flags, confidence, text} with

- confidence in [0,1] (the reference rescales Tesseract's percentage,
  /root/reference/src/lib.cpp:302-304);
- flags = StartOfLine(1) | EndOfLine(2) bitmask computed from position in
  the line (/root/reference/src/ocr-engine.ts:32-35, src/lib.cpp:308-315);
- the empty-page quirk: layout yields 0 boxes but recognition yields one
  all-zero empty text box (/root/reference/test/ocr-engine-test.js:211-229).

Glyph cells are closed-form slices of the word box (GlyphModel invariants)
and matched vectorized: all cells of a page are stacked into one
[n_glyphs, 35] matrix and compared against the template bank by Hamming
distance in a single numpy broadcast.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..state.glyph_model import CHAR_PITCH, GLYPH_H, GLYPH_W, GlyphModel
from .layout import Rect, analyze_layout

START_OF_LINE = 1
END_OF_LINE = 2

_EMPTY_RECT = Rect(0, 0, 0, 0)


@dataclass(frozen=True)
class TextItem:
    rect: Rect
    flags: int
    confidence: float
    text: str


def _word_cells(ink: np.ndarray, rect: Rect, scale: int) -> np.ndarray | None:
    """Slice a word box into its glyph cells -> bool [n, 7, 5], downsampled
    to glyph resolution. None if the box is not grid-aligned (noise/foreign
    marks)."""
    w = rect.right - rect.left
    h = rect.bottom - rect.top
    if scale < 1 or h != GLYPH_H * scale or (w + scale) % (CHAR_PITCH * scale) != 0:
        return None
    n = (w + scale) // (CHAR_PITCH * scale)
    if n < 1:
        return None
    box = ink[rect.top : rect.bottom, rect.left : rect.right]
    cells = np.zeros((n, GLYPH_H, GLYPH_W), dtype=bool)
    for i in range(n):
        x0 = i * CHAR_PITCH * scale
        cell = box[:, x0 : x0 + GLYPH_W * scale]
        if scale > 1:
            cell = (
                cell.reshape(GLYPH_H, scale, GLYPH_W, scale).mean(axis=(1, 3)) > 0.5
            )
        cells[i] = cell
    return cells


def recognize_page(
    ink: np.ndarray, model: GlyphModel, on_progress=None
) -> tuple[list[TextItem], list[TextItem], float]:
    """-> (word items, line items, mean glyph match score).

    The mean match score over all glyph cells is also the orientation
    metric used by orientation.detect_orientation.

    ``on_progress(pct)`` (0-100, monotone, always ending at 100) mirrors
    the reference's progress channel (/root/reference/src/lib.cpp:79-98,
    monotonicity test at test/ocr-engine-test.js:309-338).
    """
    progress = on_progress or (lambda pct: None)
    progress(0)
    lines, words_per_line = analyze_layout(ink)
    if not lines:
        # Reference quirk: one empty all-zero text box on blank pages.
        empty = TextItem(_EMPTY_RECT, 0, 0.0, "")
        progress(100)
        return [empty], [empty], 0.0
    progress(20)

    all_cells: list[np.ndarray] = []
    cell_counts: list[int] = []  # glyphs per word, parallel to flat word list
    flat_words: list[tuple[int, Rect]] = []
    for li, (line, wrects) in enumerate(zip(lines, words_per_line)):
        scale = max(1, round((line.bottom - line.top) / GLYPH_H))
        for wr in wrects:
            cells = _word_cells(ink, wr, scale)
            if cells is None:
                cells = np.zeros((0, GLYPH_H, GLYPH_W), dtype=bool)
            all_cells.append(cells.reshape(-1, GLYPH_H * GLYPH_W))
            cell_counts.append(len(cells))
            flat_words.append((li, wr))

    if all_cells and sum(cell_counts):
        stacked = np.concatenate(all_cells, axis=0)  # [G, 35]
        # Vectorized Hamming match against the whole template bank.
        ham = (stacked[:, None, :] != model.flat[None, :, :]).sum(axis=2)
        best = ham.argmin(axis=1)
        score = 1.0 - ham[np.arange(len(best)), best] / (GLYPH_H * GLYPH_W)
    else:
        best = np.zeros(0, dtype=int)
        score = np.zeros(0)

    word_items: list[TextItem] = []
    per_line_words: dict[int, list[TextItem]] = {}
    pos = 0
    for (li, wr), n in zip(flat_words, cell_counts):
        chars = "".join(model.charset[best[pos + i]] for i in range(n))
        conf = float(score[pos : pos + n].mean()) if n else 0.0
        item = TextItem(wr, 0, conf, chars)
        per_line_words.setdefault(li, []).append(item)
        pos += n

    progress(60)
    line_items: list[TextItem] = []
    for li, line in enumerate(lines):
        witems = per_line_words.get(li, [])
        if not witems:
            continue
        # StartOfLine / EndOfLine flags from position in line
        # (/root/reference/src/lib.cpp:308-315).
        flagged = []
        for wi, it in enumerate(witems):
            flags = (START_OF_LINE if wi == 0 else 0) | (
                END_OF_LINE if wi == len(witems) - 1 else 0
            )
            flagged.append(TextItem(it.rect, flags, it.confidence, it.text))
        word_items.extend(flagged)
        text = " ".join(it.text for it in flagged)
        conf = float(np.mean([it.confidence for it in flagged]))
        line_items.append(
            TextItem(line, START_OF_LINE | END_OF_LINE, conf, text)
        )

    mean_score = float(score.mean()) if score.size else 0.0
    progress(100)
    return word_items, line_items, mean_score


def assemble_text(line_items: list[TextItem]) -> str:
    """Reading-order page text, one \\n-terminated line per text line
    (/root/reference/src/lib.cpp:211-214)."""
    return "".join(it.text + "\n" for it in line_items if it.text)
