"""PDF codec (functions/pdfcodec.py): round trips, escaping, structure."""

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tesseract_wasm_ray.functions.pdfcodec import (
    decode_pdf_text,
    encode_pdf,
    _page_text,
)


def test_roundtrip_single_page_both_filters():
    pages = [["alpha beta", "gamma (delta) \\ eps", ""]]
    for comp in (True, False):
        got = decode_pdf_text(encode_pdf(pages, compress=comp))
        assert got == ["\n".join(pages[0])]


def test_roundtrip_multi_page():
    pages = [["p1 l1", "p1 l2"], ["p2 l1"], [], ["p4 after empty page"]]
    got = decode_pdf_text(encode_pdf(pages))
    assert got == ["p1 l1\np1 l2", "p2 l1", "", "p4 after empty page"]


def test_special_chars_escape_roundtrip():
    line = "parens )( backslash \\ tab\t octal-ish \\101 newline-char"
    got = decode_pdf_text(encode_pdf([[line]]))
    assert got == [line]


def test_valid_pdf_structure():
    pdf = encode_pdf([["x"]])
    assert pdf.startswith(b"%PDF-1.4")
    assert b"xref" in pdf and b"trailer" in pdf and pdf.rstrip().endswith(b"%%EOF")
    assert b"/FlateDecode" in pdf
    assert b"/FlateDecode" not in encode_pdf([["x"]], compress=False)


def test_content_tokenizer_variants():
    # TJ array with kerning numbers, hex strings, ' operator
    content = b"BT /F1 12 Tf 72 720 Td [(he) -20 (llo)] TJ 0 -14 Td <20776F726C64> Tj T* (next) ' ET"
    assert _page_text(content) == ["hello", " world", "next"]


def test_octal_escapes_decode():
    content = b"BT 72 720 Td (\\101\\102\\103 \\60) Tj ET"
    assert _page_text(content) == ["ABC 0"]


def test_errors():
    with pytest.raises(ValueError):
        decode_pdf_text(b"not a pdf")
    with pytest.raises(ValueError):
        encode_pdf([])
    pdf = bytearray(encode_pdf([["x"]]))
    with pytest.raises(ValueError):
        decode_pdf_text(bytes(pdf).replace(b"trailer", b"trailor"))
    # corrupt the deflate stream -> zlib error surfaces
    i = bytes(pdf).find(b"stream\n") + 7
    pdf[i : i + 4] = b"\x00\x00\x00\x00"
    with pytest.raises(Exception):
        decode_pdf_text(bytes(pdf))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                max_size=30,
            ),
            max_size=4,
        ),
        min_size=1,
        max_size=3,
    ),
    st.booleans(),
)
def test_roundtrip_property(pages, comp):
    got = decode_pdf_text(encode_pdf(pages, compress=comp))
    assert got == ["\n".join(p) for p in pages]
