"""Orientation detection: rotation in {0, 90, 180, 270} + confidence.

From-scratch analogue of the reference's ``getOrientation``
(/root/reference/src/ocr-engine.ts:310-313) whose C++ side quantizes two
Leptonica rise/run confidence scalars into a quadrant
(/root/reference/src/lib.cpp:242-288).  We keep the same *decision
structure* — first choose the text-line axis, then the direction along
that axis — but compute the metrics from our glyph kernel:

- axis: candidate rotations whose row-projection yields clean 7*scale
  line bands score via glyph-template match quality;
- direction: the 180-ambiguity is resolved by template match score
  (rotated glyphs don't match the upright template bank).

Convention: the returned rotation r is the rotation that WAS APPLIED to
the upright page (counter-clockwise, matching numpy ``rot90``); applying
``np.rot90(img, k=(4 - r // 90) % 4)`` restores the upright page.  This
mirrors the reference's round-trip test (rotate fixture by r, assert
detected rotation == r, /root/reference/test/ocr-engine-test.js:340-352).
"""

from __future__ import annotations

import numpy as np

from ..state.glyph_model import GlyphModel
from .recognize import recognize_page

ROTATIONS = (0, 90, 180, 270)


def derotate(img: np.ndarray, rotation: int) -> np.ndarray:
    """Undo an applied counter-clockwise rotation (works for [H,W] and
    [H,W,C] arrays)."""
    return np.rot90(img, k=(4 - rotation // 90) % 4)


def detect_orientation(
    ink: np.ndarray, model: GlyphModel
) -> tuple[int, float]:
    """-> (rotation, confidence in [0,1]).

    Blank pages return (0, 0.0), mirroring the reference's behavior of
    returning a low-confidence default when no text is found.
    """
    if not ink.any():
        return 0, 0.0
    scores = []
    for r in ROTATIONS:
        upright = derotate(ink, r)
        _, _, score = recognize_page(upright, model)
        scores.append(score)
    # Stable sort so ties prefer the smaller rotation deterministically.
    order = np.argsort(-np.asarray(scores), kind="stable")
    best, second = order[0], order[1]
    if scores[best] <= 0.0:
        return 0, 0.0
    margin = scores[best] - scores[second]
    # Clean pages match their templates near-perfectly upright and poorly
    # rotated, so confidence ~= the absolute match quality; ties (margin
    # ~0) are ambiguous.
    confidence = float(scores[best]) if margin > 0.02 else float(margin)
    return ROTATIONS[best], confidence
