"""Deterministic 5x7 glyph bitmap model — our ``eng.traineddata`` analogue.

The reference loads an opaque LSTM model blob once per engine
(``loadModel`` -> ``TessBaseAPI::Init``, /root/reference/src/ocr-engine.ts:155-163,
/root/reference/src/lib.cpp:133-148).  Here the "trained data" is a
deterministic bitmap font shared between the fixture *renderer* and the
*recognizer*, so ground truth is exact by construction (SURVEY.md §7.0).

Every glyph satisfies four invariants the layout analyzer relies on
(asserted in ``build``):

- ink in row 0 and row 6  -> every rendered word's tight bounding box is
  exactly ``7*scale`` pixels tall;
- ink in col 0 and col 4  -> every rendered word's tight bounding box is
  exactly ``(6*n - 1)*scale`` pixels wide for ``n`` glyphs at pitch
  ``6*scale``.

This makes glyph-cell segmentation a closed-form slice, mirroring how the
reference's page iterator walks exact word rectangles
(/root/reference/src/lib.cpp:291-323).
"""

from __future__ import annotations

import io

import numpy as np

GLYPH_W = 5
GLYPH_H = 7
# Horizontal advance between glyph cells within a word, in glyph units.
CHAR_PITCH = 6
# Gap between words on a line, in glyph units (so word gaps are >= 4*scale
# columns while intra-word gaps are exactly 1*scale).
WORD_GAP = 4
# Vertical advance between lines, in glyph units.
LINE_PITCH = 12

_FONT = {
    "A": ["..X..", ".X.X.", "X...X", "X...X", "XXXXX", "X...X", "X...X"],
    "B": ["XXXX.", "X...X", "X...X", "XXXX.", "X...X", "X...X", "XXXX."],
    "C": [".XXX.", "X...X", "X....", "X....", "X....", "X...X", ".XXX."],
    "D": ["XXXX.", "X...X", "X...X", "X...X", "X...X", "X...X", "XXXX."],
    "E": ["XXXXX", "X....", "X....", "XXXX.", "X....", "X....", "XXXXX"],
    "F": ["XXXXX", "X....", "X....", "XXXX.", "X....", "X....", "X...."],
    "G": [".XXX.", "X...X", "X....", "X.XXX", "X...X", "X...X", ".XXXX"],
    "H": ["X...X", "X...X", "X...X", "XXXXX", "X...X", "X...X", "X...X"],
    "I": ["XXXXX", "..X..", "..X..", "..X..", "..X..", "..X..", "XXXXX"],
    "J": ["XXXXX", "...X.", "...X.", "...X.", "...X.", "X..X.", ".XX.."],
    "K": ["X...X", "X..X.", "X.X..", "XX...", "X.X..", "X..X.", "X...X"],
    "L": ["X....", "X....", "X....", "X....", "X....", "X....", "XXXXX"],
    "M": ["X...X", "XX.XX", "X.X.X", "X.X.X", "X...X", "X...X", "X...X"],
    "N": ["X...X", "XX..X", "X.X.X", "X..XX", "X...X", "X...X", "X...X"],
    "O": [".XXX.", "X...X", "X...X", "X...X", "X...X", "X...X", ".XXX."],
    "P": ["XXXX.", "X...X", "X...X", "XXXX.", "X....", "X....", "X...."],
    "Q": [".XXX.", "X...X", "X...X", "X...X", "X.X.X", "X..X.", ".XX.X"],
    "R": ["XXXX.", "X...X", "X...X", "XXXX.", "X.X..", "X..X.", "X...X"],
    "S": [".XXXX", "X....", "X....", ".XXX.", "....X", "....X", "XXXX."],
    "T": ["XXXXX", "..X..", "..X..", "..X..", "..X..", "..X..", "..X.."],
    "U": ["X...X", "X...X", "X...X", "X...X", "X...X", "X...X", ".XXX."],
    "V": ["X...X", "X...X", "X...X", "X...X", ".X.X.", ".X.X.", "..X.."],
    "W": ["X...X", "X...X", "X...X", "X.X.X", "X.X.X", "XX.XX", "X...X"],
    "X": ["X...X", ".X.X.", ".X.X.", "..X..", ".X.X.", ".X.X.", "X...X"],
    "Y": ["X...X", "X...X", ".X.X.", "..X..", "..X..", "..X..", "..X.."],
    "Z": ["XXXXX", "....X", "...X.", "..X..", ".X...", "X....", "XXXXX"],
    "0": [".XXX.", "X...X", "X..XX", "X.X.X", "XX..X", "X...X", ".XXX."],
    "1": ["..X..", ".XX..", "..X..", "..X..", "..X..", "..X..", "XXXXX"],
    "2": [".XXX.", "X...X", "....X", "...X.", "..X..", ".X...", "XXXXX"],
    "3": ["XXXX.", "....X", "....X", ".XXX.", "....X", "....X", "XXXX."],
    "4": ["...X.", "..XX.", ".X.X.", "X..X.", "XXXXX", "...X.", "...X."],
    "5": ["XXXXX", "X....", "X....", "XXXX.", "....X", "X...X", ".XXX."],
    "6": [".XXX.", "X....", "X....", "XXXX.", "X...X", "X...X", ".XXX."],
    "7": ["XXXXX", "....X", "...X.", "..X..", "..X..", "..X..", "..X.."],
    "8": [".XXX.", "X...X", "X...X", ".XXX.", "X...X", "X...X", ".XXX."],
    "9": [".XXX.", "X...X", "X...X", ".XXXX", "....X", "....X", ".XXX."],
}

_MAGIC = b"TWRGLYPH1\n"


class GlyphModel:
    """Glyph templates + charset. Load once per OCR actor (SURVEY.md §2.3 ST2)."""

    def __init__(self, charset: str, templates: np.ndarray):
        assert templates.shape == (len(charset), GLYPH_H, GLYPH_W)
        self.charset = charset
        self.templates = templates.astype(bool)
        # [n_glyphs, 35] flattened for vectorized hamming matching.
        self.flat = self.templates.reshape(len(charset), GLYPH_H * GLYPH_W)

    # -- construction ------------------------------------------------------

    @classmethod
    def build(cls) -> "GlyphModel":
        charset = "".join(sorted(_FONT))
        arr = np.zeros((len(charset), GLYPH_H, GLYPH_W), dtype=bool)
        for i, ch in enumerate(charset):
            rows = _FONT[ch]
            assert len(rows) == GLYPH_H
            for r, row in enumerate(rows):
                assert len(row) == GLYPH_W
                arr[i, r] = [c == "X" for c in row]
            g = arr[i]
            # Layout invariants (see module docstring).
            assert g[0].any() and g[-1].any(), f"glyph {ch}: empty top/bottom row"
            assert g[:, 0].any() and g[:, -1].any(), f"glyph {ch}: empty edge col"
        flat = arr.reshape(len(charset), -1)
        # Pairwise distinctness so template matching is unambiguous.
        ham = (flat[:, None, :] != flat[None, :, :]).sum(-1)
        np.fill_diagonal(ham, GLYPH_H * GLYPH_W)
        assert ham.min() >= 2, "glyph templates not pairwise distinct"
        return cls(charset, arr)

    # -- serialization (the on-disk "traineddata" blob) --------------------

    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        buf.write(_MAGIC)
        buf.write(self.charset.encode() + b"\n")
        np.save(buf, np.packbits(self.templates, axis=None))
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "GlyphModel":
        buf = io.BytesIO(data)
        if buf.read(len(_MAGIC)) != _MAGIC:
            raise ValueError("not a glyph model blob")
        charset = buf.readline().strip().decode()
        packed = np.load(buf)
        n = len(charset) * GLYPH_H * GLYPH_W
        arr = np.unpackbits(packed)[:n].reshape(len(charset), GLYPH_H, GLYPH_W)
        return cls(charset, arr.astype(bool))

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            f.write(self.to_bytes())

    @classmethod
    def load(cls, path: str) -> "GlyphModel":
        with open(path, "rb") as f:
            return cls.from_bytes(f.read())

    def index(self, ch: str) -> int:
        return self.charset.index(ch)
