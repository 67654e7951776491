"""hOCR XHTML rendering from recognized word/line items.

From-scratch analogue of the reference's ``getHOCR``: header/footer
template + per-line/per-word body (/root/reference/src/lib.cpp:216-240).
Attributes mirror the reference's golden assertions: ``bbox l t r b`` and
``x_wconf NN`` (/root/reference/test/ocr-engine-test.js:289-307).
"""

from __future__ import annotations

from .recognize import TextItem

_HEADER = """<?xml version="1.0" encoding="UTF-8"?>
<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Transitional//EN" "http://www.w3.org/TR/xhtml1/DTD/xhtml1-transitional.dtd">
<html xmlns="http://www.w3.org/1999/xhtml" xml:lang="en">
 <head>
  <title></title>
  <meta http-equiv="Content-Type" content="text/html;charset=utf-8"/>
  <meta name='ocr-system' content='tesseract_wasm_ray {version}'/>
  <meta name='ocr-capabilities' content='ocr_page ocr_line ocrx_word'/>
 </head>
 <body>
"""

_FOOTER = """ </body>
</html>
"""


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def render_hocr(
    words: list[TextItem],
    lines: list[TextItem],
    width: int,
    height: int,
    page_id: int = 1,
    version: str = "0.1.0",
) -> str:
    """words must be the FULL reading-order word list (including
    empty-text items) so StartOfLine grouping stays aligned 1:1 with
    ``lines``; empty-text words are dropped per group at render time
    (pre-filtering the input would shift groups onto the wrong line
    bboxes whenever a line's words are all empty)."""
    out = [_HEADER.format(version=version)]
    out.append(
        f"  <div class='ocr_page' id='page_{page_id}' "
        f"title='bbox 0 0 {width} {height}'>\n"
    )
    # Group words into lines via StartOfLine flags (no filtering here —
    # alignment with `lines` is positional).
    grouped: list[list[TextItem]] = []
    for w in words:
        if w.flags & 1 or not grouped:
            grouped.append([])
        grouped[-1].append(w)
    li = 0
    for line, group in zip(lines, grouped):
        ws = [w for w in group if w.text]
        if not ws:
            continue
        li += 1
        r = line.rect
        out.append(
            f"   <span class='ocr_line' id='line_{page_id}_{li}' "
            f"title='bbox {r.left} {r.top} {r.right} {r.bottom}'>\n"
        )
        for wi, w in enumerate(ws, start=1):
            wr = w.rect
            conf = round(w.confidence * 100)
            out.append(
                f"    <span class='ocrx_word' id='word_{page_id}_{li}_{wi}' "
                f"title='bbox {wr.left} {wr.top} {wr.right} {wr.bottom}; "
                f"x_wconf {conf}'>{_esc(w.text)}</span>\n"
            )
        out.append("   </span>\n")
    out.append("  </div>\n")
    out.append(_FOOTER)
    return "".join(out)
