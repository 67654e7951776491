"""Async OCRClient tier: parity with the sync engine through a Ray
actor (mirrors the reference's ocr-client test suite shape,
/root/reference/test/ocr-client-test.js)."""

import numpy as np
import pytest
import ray


@pytest.fixture(scope="module")
def client(ray_session):
    from tesseract_wasm_ray.client import OCRClient
    from tesseract_wasm_ray.state.glyph_model import GlyphModel

    c = OCRClient()
    ray.get(c.load_model(GlyphModel.build().to_bytes()))
    yield c
    c.destroy()


def _page(rotation=0):
    from tesseract_wasm_ray.functions.raster import render_page
    from tesseract_wasm_ray.state.glyph_model import GlyphModel

    return render_page(
        [["HELLO", "WORLD"], ["RAY", "DATA"]],
        GlyphModel.build(),
        scale=2,
        channels=4,
        rotation=rotation,
    )


def test_client_text_and_boxes(client):
    ray.get(client.load_image(_page()))
    text = ray.get(client.get_text())
    assert text == "HELLO WORLD\nRAY DATA\n"
    words = ray.get(client.get_text_boxes("word"))
    assert [w["text"] for w in words] == ["HELLO", "WORLD", "RAY", "DATA"]
    assert words[0]["flags"] == 1 and words[1]["flags"] == 2
    for w in words:
        r = w["rect"]
        assert r["right"] > r["left"] and r["bottom"] > r["top"]


def test_client_orientation(client):
    ray.get(client.load_image(_page(rotation=90)))
    o = ray.get(client.get_orientation())
    assert o["rotation"] == 90 and o["confidence"] > 0.9


def test_client_error_paths(client):
    ray.get(client.clear_image())
    with pytest.raises(Exception, match="No image loaded"):
        ray.get(client.get_text())
    with pytest.raises(Exception, match="Unable to get variable"):
        ray.get(client.get_variable("nope"))
    ray.get(client.set_variable("user_defined_dpi", "300"))
    assert ray.get(client.get_variable("user_defined_dpi")) == "300"


def test_client_calls_serialize_in_order(client):
    """Submission-order execution on one actor (the reference's
    per-client serialization guarantee)."""
    ray.get(client.load_image(_page()))
    refs = [client.get_text() for _ in range(5)]
    assert len({ray.get(r) for r in refs}) == 1
