"""Fixture determinism + kernel-vs-closed-form-golden agreement."""

import numpy as np

from tesseract_wasm_ray.engine import OCREngine
from tesseract_wasm_ray.fixtures import (
    doc_spec,
    documents_batch,
    golden_boxes_for_spec,
    page_spec,
    render_spec,
)
from tesseract_wasm_ray.functions.boilerplate import strip_boilerplate
from tesseract_wasm_ray.functions.orientation import derotate
from tesseract_wasm_ray.state.glyph_model import GlyphModel

MODEL = GlyphModel.build()


def test_doc_spec_deterministic():
    a, b = doc_spec(7), doc_spec(7)
    assert a == b
    assert a["doc_id"] == "doc-00000007"
    offsets = [s["offset"] for s in a["spans"]]
    assert offsets == list(range(len(offsets)))


def test_stripper_recovers_golden_text():
    # The generator records golden main text independently of the stripper;
    # the stripper must recover it exactly.
    for i in range(80):
        spec = doc_spec(i)
        for span, gold in zip(spec["spans"], spec["golden"]):
            if span["kind"] == "text":
                assert strip_boilerplate(span["text"]) == gold["text"], span["text"]


def test_kernel_matches_closed_form_golden():
    checked_blank = checked_rot = 0
    for i in range(60):
        for ref in doc_spec(i)["media_refs"]:
            spec = page_spec(ref)
            img = render_spec(spec, MODEL)
            eng = OCREngine()
            eng.load_model(MODEL)
            eng.load_image(img)
            o = eng.get_orientation()
            gold = golden_boxes_for_spec(spec)
            assert o["rotation"] == gold["orientation"]["rotation"], ref
            if spec["rotation"]:
                checked_rot += 1
                eng.load_image(derotate(img, o["rotation"]))
            assert eng.get_text() == gold["text"], ref
            words = eng.get_text_boxes("word")
            assert [w.text for w in words] == [w["text"] for w in gold["words"]], ref
            for w, gw in zip(words, gold["words"]):
                assert w.flags == gw["flags"]
                r, gr = w.rect, gw["rect"]
                assert (r.left, r.top, r.right, r.bottom) == (
                    gr["left"], gr["top"], gr["right"], gr["bottom"]), ref
            if not spec["lines"]:
                checked_blank += 1
    assert checked_rot > 3
    assert checked_blank >= 0


def test_blank_noisy_page_is_blank():
    # A blank page with sensor noise must binarize to no ink.
    spec = None
    for i in range(500):
        for ref in doc_spec(i)["media_refs"]:
            s = page_spec(ref)
            if not s["lines"] and s["noisy"]:
                spec = s
                break
        if spec:
            break
    assert spec is not None, "no blank noisy page in the first 500 docs"
    img = render_spec(spec, MODEL)
    eng = OCREngine()
    eng.load_model(MODEL)
    eng.load_image(img)
    assert eng.get_bounding_boxes("word") == []
    assert eng.get_text() == ""
    boxes = eng.get_text_boxes("word")
    assert len(boxes) == 1 and boxes[0].text == ""


def test_documents_batch_schema():
    t = documents_batch(np.arange(5))
    assert t.num_rows == 5
    assert t.schema.field("doc_id").type == "string"
    assert str(t.schema.field("spans").type).startswith("list<")
