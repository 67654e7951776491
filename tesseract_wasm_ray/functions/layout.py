"""Page layout analysis: projection-profile segmentation into lines/words.

From-scratch analogue of the reference's ``getBoundingBoxes`` /
``AnalyseLayout`` path (/root/reference/src/ocr-engine.ts:241-245,
/root/reference/src/lib.cpp:197-203): given a binarized page, produce
line bands (row-projection) and word boxes (column-projection within each
band).  Works without a glyph model, mirroring the reference's
layout-without-model behavior (/root/reference/src/lib.cpp:173-175,
test/ocr-engine-test.js:174-182).

Rect convention: IntRect {left, top, right, bottom}, top-left origin,
exclusive right/bottom (/root/reference/src/lib.cpp:12-17).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class Rect:
    left: int
    top: int
    right: int
    bottom: int


def _runs(mask: np.ndarray) -> list[tuple[int, int]]:
    """Maximal runs of True in a 1-D bool array as [start, end) pairs."""
    if mask.size == 0 or not mask.any():
        return []
    d = np.diff(mask.view(np.int8), prepend=np.int8(0), append=np.int8(0))
    starts = np.flatnonzero(d == 1)
    ends = np.flatnonzero(d == -1)
    return list(zip(starts.tolist(), ends.tolist()))


def _span(mask: np.ndarray) -> tuple[int, int]:
    """[first_true, last_true+1) of a 1-D bool mask (assumes any True)."""
    first = int(mask.argmax())
    last = int(len(mask) - mask[::-1].argmax())
    return first, last


def segment_lines(ink: np.ndarray) -> list[Rect]:
    """Row-projection line bands, tight on both axes."""
    rows = ink.any(axis=1)
    out = []
    for y0, y1 in _runs(rows):
        cols = ink[y0:y1].any(axis=0)
        if cols.any():
            x0, x1 = _span(cols)
            out.append(Rect(x0, int(y0), x1, int(y1)))
    return out


def segment_words(ink: np.ndarray, line: Rect, scale: int | None = None) -> list[Rect]:
    """Column-projection word boxes within a line band.

    Word gaps are >= 4*scale blank columns, intra-word (glyph pitch) gaps
    exactly 1*scale (raster.py geometry).  If ``scale`` is unknown it is
    estimated from the line height (7 glyph rows per line).
    """
    band = ink[line.top : line.bottom, line.left : line.right]
    cols = band.any(axis=0)
    if scale is None:
        scale = max(1, round((line.bottom - line.top) / 7))
    gap_thresh = 2 * scale  # blank runs >= this split words
    col_runs = _runs(cols)
    if not col_runs:
        return []
    words: list[Rect] = []
    cur_start, cur_end = col_runs[0]
    for s, e in col_runs[1:]:
        if s - cur_end >= gap_thresh:
            words.append(_word_rect(band, line, cur_start, cur_end))
            cur_start, cur_end = s, e
        else:
            cur_end = e
    words.append(_word_rect(band, line, cur_start, cur_end))
    return words


def _word_rect(band: np.ndarray, line: Rect, x0: int, x1: int) -> Rect:
    y0, y1 = _span(band[:, x0:x1].any(axis=1))
    return Rect(line.left + x0, line.top + y0, line.left + x1, line.top + y1)


def analyze_layout(ink: np.ndarray) -> tuple[list[Rect], list[list[Rect]]]:
    """-> (line rects, per-line word rects)."""
    lines = segment_lines(ink)
    words = [segment_words(ink, ln) for ln in lines]
    return lines, words
