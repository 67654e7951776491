"""Kernel golden/property tests, mirroring the reference's test strategy
(SURVEY.md §5; /root/reference/test/ocr-engine-test.js)."""

import numpy as np
import pytest

from tesseract_wasm_ray.engine import OCREngine, OCRError
from tesseract_wasm_ray.functions.raster import page_text, render_page
from tesseract_wasm_ray.state.glyph_model import GlyphModel

MODEL = GlyphModel.build()

PAGE = [["HELLO", "WORLD"], ["RAY", "DATA", "ENGINE"], ["GLYPH42"]]


def make_engine(img=None, model=True):
    eng = OCREngine()
    if model:
        eng.load_model(MODEL)
    if img is not None:
        eng.load_image(img)
    return eng


@pytest.mark.parametrize("scale", [1, 2, 3])
@pytest.mark.parametrize("channels", [1, 4])
def test_roundtrip_exact(scale, channels):
    rng = np.random.default_rng(7)
    img = render_page(PAGE, MODEL, scale=scale, channels=channels, noise_rng=rng)
    eng = make_engine(img)
    assert eng.get_text() == page_text(PAGE)
    words = eng.get_text_boxes("word")
    assert [w.text for w in words] == [w for ws in PAGE for w in ws]
    # Statistical tolerance mirror (test/ocr-engine-test.js:194-208).
    assert np.mean([w.confidence for w in words]) > 0.95


def test_model_roundtrip_bytes(tmp_path):
    blob = MODEL.to_bytes()
    m2 = GlyphModel.from_bytes(blob)
    assert m2.charset == MODEL.charset
    assert (m2.templates == MODEL.templates).all()
    p = tmp_path / "glyph.traineddata"
    MODEL.save(str(p))
    m3 = GlyphModel.load(str(p))
    assert (m3.templates == MODEL.templates).all()


def test_layout_counts_and_invariants():
    img = render_page(PAGE, MODEL, scale=2)
    eng = make_engine(img, model=False)  # layout works without a model
    words = eng.get_bounding_boxes("word")
    lines = eng.get_bounding_boxes("line")
    assert len(words) == 6
    assert len(lines) == 3
    h, w = img.shape
    for item in words + lines:
        r = item["rect"]
        # Property invariants (test/ocr-engine-test.js:153-168).
        assert 0 <= r.left < r.right <= w
        assert 0 <= r.top < r.bottom <= h


def test_word_flags():
    img = render_page(PAGE, MODEL)
    eng = make_engine(img)
    words = eng.get_text_boxes("word")
    # StartOfLine / EndOfLine lists (test/ocr-engine-test.js:231-268).
    starts = [w.text for w in words if w.flags & 1]
    ends = [w.text for w in words if w.flags & 2]
    assert starts == ["HELLO", "RAY", "GLYPH42"]
    assert ends == ["WORLD", "ENGINE", "GLYPH42"]


def test_empty_page_quirk():
    for size in [(8, 8), (50, 20), (200, 100)]:
        img = np.full(size, 255, dtype=np.uint8)
        eng = make_engine(img)
        # 0 layout boxes but 1 empty text box (test/ocr-engine-test.js:211-229).
        assert eng.get_bounding_boxes("word") == []
        boxes = eng.get_text_boxes("word")
        assert len(boxes) == 1
        assert boxes[0].text == ""
        assert boxes[0].rect.right == 0
        assert eng.get_text() == ""


@pytest.mark.parametrize("rotation", [0, 90, 180, 270])
def test_orientation_roundtrip(rotation):
    # Mirror of test/ocr-engine-test.js:340-352.
    rng = np.random.default_rng(11)
    img = render_page(PAGE, MODEL, scale=2, noise_rng=rng, rotation=rotation)
    eng = make_engine(img)
    o = eng.get_orientation()
    assert o["rotation"] == rotation
    assert o["confidence"] > 0.9


def test_error_paths():
    eng = OCREngine()
    with pytest.raises(OCRError):
        eng.get_text()  # no image
    img = render_page(PAGE, MODEL)
    eng.load_image(img)
    with pytest.raises(OCRError):
        eng.get_text()  # no model
    with pytest.raises(OCRError):
        eng.load_image(np.zeros((0, 5), dtype=np.uint8))
    with pytest.raises(OCRError):
        eng.load_image(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(OCRError):
        eng.get_variable("nope")
    eng.set_variable("user_defined_dpi", "300")
    assert eng.get_variable("user_defined_dpi") == "300"


def test_clear_image_invalidates():
    img = render_page(PAGE, MODEL)
    eng = make_engine(img)
    assert eng.get_text() != ""
    eng.clear_image()
    with pytest.raises(OCRError):
        eng.get_text()


def test_memoized_results_are_reused():
    img = render_page(PAGE, MODEL)
    eng = make_engine(img)
    boxes1 = eng.get_text_boxes("word")
    text = eng.get_text()
    boxes2 = eng.get_text_boxes("word")
    assert boxes1 is boxes2  # single Recognize pass (lib.cpp:325-336)
    assert text == page_text(PAGE)


def test_hocr_contains_bbox_and_conf():
    img = render_page(PAGE, MODEL)
    eng = make_engine(img)
    hocr = eng.get_hocr()
    assert "ocr_page" in hocr and "ocrx_word" in hocr
    assert "HELLO" in hocr and "x_wconf" in hocr
    first = eng.get_text_boxes("word")[0]
    r = first.rect
    assert f"bbox {r.left} {r.top} {r.right} {r.bottom}" in hocr


def test_progress_monotone_and_cached_run_reports_100():
    """Mirrors /root/reference/test/ocr-engine-test.js:309-338: progress
    is monotone ending at 100; a cached second run reports just [100]."""
    import numpy as np

    from tesseract_wasm_ray.engine import OCREngine
    from tesseract_wasm_ray.functions.raster import render_page
    from tesseract_wasm_ray.state.glyph_model import GlyphModel

    m = GlyphModel.build()
    eng = OCREngine()
    eng.load_model(m)
    eng.load_image(render_page([["HELLO", "WORLD"]], m))
    seen: list[int] = []
    eng.add_progress_listener(seen.append)
    eng.get_text()
    assert seen == sorted(seen) and seen[-1] == 100 and len(seen) >= 2
    seen.clear()
    eng.get_text_boxes("word")  # cached
    assert seen == [100]
    eng.remove_progress_listener(seen.append)
    seen.clear()
    eng.clear_image()
    eng.load_image(render_page([["RAY"]], m))
    eng.get_text()
    assert seen == []  # listener removed


def test_statistical_tolerances():
    """Mirrors /root/reference/test/ocr-engine-test.js:194-195,207-208:
    mean recognized word length and mean confidence within tolerance
    over a sample of fixture pages."""
    import numpy as np

    from tesseract_wasm_ray.engine import OCREngine
    from tesseract_wasm_ray.fixtures import doc_spec, page_spec, render_spec
    from tesseract_wasm_ray.state.glyph_model import GlyphModel

    m = GlyphModel.build()
    eng = OCREngine()
    eng.load_model(m)
    lens, confs = [], []
    i = 0
    while len(lens) < 200:
        for ref in doc_spec(i)["media_refs"]:
            spec = page_spec(ref)
            if not spec["lines"]:
                continue
            eng.load_image(render_spec(spec, m))
            eng.orient_and_recognize()
            for w in eng.get_text_boxes("word"):
                if w.text:
                    lens.append(len(w.text))
                    confs.append(w.confidence)
        i += 1
    assert 2.0 < np.mean(lens) < 8.0  # fixture words are 1-6 chars of PAGE_WORDS
    assert np.mean(confs) > 0.95


def test_orientation_ambiguous_symmetric_page_low_confidence():
    """A palindromic page of 180-symmetric glyphs ("SOS"/"OXO") reads
    identically upright and upside-down: the early exit must NOT report
    ~1.0 confidence — the 180-counterpart check falls back to the
    margin-based (ambiguous ~0) confidence (ADVICE round 1)."""
    img = render_page([["SOS", "OXO"], ["OXO", "SOS"]], MODEL, scale=2)
    eng = make_engine(img)
    o = eng.get_orientation()
    assert o["confidence"] <= 0.02, o
    # A normal asymmetric page still early-exits with high confidence.
    img2 = render_page([["HELLO"]], MODEL, scale=2)
    eng2 = make_engine(img2)
    assert eng2.get_orientation()["confidence"] > 0.9


def test_axis_probe_order_routes_all_rotations():
    """The projection axis pre-test must put the true rotation in the
    first TWO probes for every rotation of every page shape (upright
    pages in (0,180,..), rotated in (90,270,..)) — a misroute costs two
    extra recognition passes per page (regression: the first cut of the
    heuristic misrouted 28% of upright pages)."""
    from tesseract_wasm_ray.functions.binarize import binarize
    from tesseract_wasm_ray.functions.orientation import _axis_probe_order

    rng = np.random.default_rng(13)
    shapes = [
        [["HELLO"]],                      # single word
        [["DATA", "RAY"]],                # single line, two words
        [["PIPELINE", "WORKER"], ["GLYPH"]],
        [["A"], ["B4"], ["SCAN", "MERGE", "JOIN"]],
    ]
    for scale in (1, 2):
        for lines in shapes:
            for rot in (0, 90, 180, 270):
                img = render_page(lines, MODEL, scale=scale,
                                  noise_rng=np.random.default_rng(3), rotation=rot)
                ink = binarize(img)
                order = _axis_probe_order(ink)
                assert order.index(rot) < 2, (lines, scale, rot, order)
