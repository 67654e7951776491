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


# A rotation whose mean glyph-match score reaches this is accepted
# without scoring the remaining rotations.  Measured on the fixture
# distribution: correct rotations score exactly 1.0 (min over 150 pages),
# wrong rotations max 0.964 — the gap makes 0.995 a safe early exit.
# Model-dependent: re-measure if the glyph bank changes.
EARLY_EXIT_SCORE = 0.995


def detect_orientation_and_recognize(ink: np.ndarray, model: GlyphModel):
    """-> (rotation, confidence, upright_ink, ocr_results).

    Scores rotations in ROTATIONS order with an early exit at
    EARLY_EXIT_SCORE, and returns the winning rotation's recognition
    results so callers can reuse them instead of re-recognizing
    (recognition is the per-page cost; this saves the 5th pass and, for
    upright pages, passes 2-4 as well).

    Blank pages return (0, 0.0, ink, blank_results), mirroring the
    reference's low-confidence default when no text is found.
    """
    if not ink.any():
        return 0, 0.0, ink, recognize_page(ink, model)
    scores: list[float] = []
    results = []
    uprights = []
    for idx, r in enumerate(ROTATIONS):
        upright = derotate(ink, r)
        res = recognize_page(upright, model)
        scores.append(res[2])
        results.append(res)
        uprights.append(upright)
        if res[2] >= EARLY_EXIT_SCORE:
            # The one realistic tie is the 180° counterpart (a page of
            # 180-symmetric glyphs scores high both ways).  If the
            # counterpart was already scored it failed the threshold —
            # no tie possible.  Otherwise a cheap ink-overlap screen
            # (one AND/OR pass) decides whether to pay one extra
            # recognition; only near-symmetric pages do, and for them we
            # reproduce the full scan's margin-based confidence instead
            # of reporting ~1.0 for an ambiguous page.
            i2 = ROTATIONS.index((r + 180) % 360)
            if i2 > idx:
                # Screen on the ink-BBOX crop (margins shift under
                # rotation; the glyph block itself is what can be
                # symmetric): IoU(crop, rot180(crop)) >= 0.98 tolerates
                # residual binarization specks.
                ys, xs = np.nonzero(upright)
                crop = upright[ys.min() : ys.max() + 1, xs.min() : xs.max() + 1]
                r180 = np.rot90(crop, 2)
                union = int(np.logical_or(crop, r180).sum())
                iou = int(np.logical_and(crop, r180).sum()) / union if union else 0.0
                if iou >= 0.98:
                    u2 = derotate(ink, ROTATIONS[i2])
                    res2 = recognize_page(u2, model)
                    if res2[2] >= EARLY_EXIT_SCORE:
                        hi, lo = (idx, i2) if res[2] >= res2[2] else (i2, idx)
                        margin = abs(float(res[2]) - float(res2[2]))
                        conf = float(max(res[2], res2[2])) if margin > 0.02 else margin
                        win_res = res if hi == idx else res2
                        win_up = upright if hi == idx else u2
                        return ROTATIONS[hi], conf, win_up, win_res
            return r, float(res[2]), upright, res
    # Full scan: stable sort so ties prefer the smaller rotation.
    order = np.argsort(-np.asarray(scores), kind="stable")
    best, second = int(order[0]), int(order[1])
    if scores[best] <= 0.0:
        return 0, 0.0, ink, recognize_page(ink, model)
    margin = scores[best] - scores[second]
    # Clean pages match their templates near-perfectly upright and poorly
    # rotated, so confidence ~= the absolute match quality; ties (margin
    # ~0) are ambiguous.
    confidence = float(scores[best]) if margin > 0.02 else float(margin)
    return ROTATIONS[best], confidence, uprights[best], results[best]


def detect_orientation(
    ink: np.ndarray, model: GlyphModel
) -> tuple[int, float]:
    """-> (rotation, confidence in [0,1])."""
    rotation, confidence, _, _ = detect_orientation_and_recognize(ink, model)
    return rotation, confidence
