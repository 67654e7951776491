"""From-scratch minimal PDF text codec (stdlib zlib + pure Python).

The north rule names "PDF/layout parse" as part of main-content
extraction (BASELINE.json north_rule); the reference delegates all
compressed-container decode to host libraries (sharp / browser —
/root/reference/examples/node-cli/ocr.js:10-18, src/utils.ts:4-21), so
like the other in-repo codecs this implements the public spec subset
the engine's pipelines need, from scratch:

- **encode_pdf(pages)**: a valid PDF 1.4 — catalog → page tree → one
  FlateDecode (or raw) content stream per page with standard text
  operators (``BT /F1 12 Tf 72 720 Td (line) Tj 0 -14 Td ... ET``),
  correct string escaping, a real xref table and trailer.
- **decode_pdf_text(payload)**: trailer → /Root → /Pages → /Kids walk
  (indirect references resolved, NOT a grep for streams), stream
  extraction with FlateDecode, and a content-stream tokenizer covering
  literal strings (nested parens + backslash escapes + octal), hex
  strings, arrays, and the text operators Tj / TJ / ' / " / Td / TD /
  T* — line breaks re-derived from the text-positioning operators.

Layout metadata (per-page line count) rides along for the layout-parse
half of the rule.  Both directions are deterministic, so the oracle
can verify the full encode → parse → inflate → tokenize round trip in
closed form from the source text.
"""

from __future__ import annotations

import re
import zlib

_ESC = {"\\": "\\\\", "(": "\\(", ")": "\\)", "\n": "\\n", "\r": "\\r", "\t": "\\t"}
_UNESC = {"\\": "\\", "(": "(", ")": ")", "n": "\n", "r": "\r", "t": "\t"}


def _escape(s: str) -> str:
    return "".join(_ESC.get(c, c) for c in s)


def encode_pdf(pages: list[list[str]], compress: bool = True) -> bytes:
    """``pages`` = one list of text lines per page -> PDF bytes."""
    if not pages:
        raise ValueError("encode_pdf wants at least one page")
    objs: list[bytes] = []  # 1-indexed object bodies

    n_pages = len(pages)
    page_ids = [4 + 2 * i for i in range(n_pages)]  # page, then its stream
    kids = " ".join(f"{p} 0 R" for p in page_ids)
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )  # 2
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )  # 3
    for i, lines in enumerate(pages):
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        for j, line in enumerate(lines):
            if j > 0:
                ops.append("0 -14 Td")
            ops.append(f"({_escape(line)}) Tj")
        ops.append("ET")
        content = "\n".join(ops).encode("latin-1", "replace")
        if compress:
            data = zlib.compress(content)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
        else:
            data = content
            head = f"<< /Length {len(data)} >>".encode()
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {page_ids[i] + 1} 0 R >>"
            ).encode()
        )
        objs.append(head + b"\nstream\n" + data + b"\nendstream")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for n, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj\b", re.S)


def _objects(payload: bytes) -> dict[int, bytes]:
    """Object number -> raw body bytes (between ``obj`` and ``endobj``)."""
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(payload):
        end = payload.find(b"endobj", m.end())
        if end < 0:
            raise ValueError("unterminated PDF object")
        objs[int(m.group(1))] = payload[m.end() : end]
    if not objs:
        raise ValueError("no PDF objects found")
    return objs


def _ref(body: bytes, key: bytes) -> int:
    m = re.search(re.escape(key) + rb"\s+(\d+)\s+0\s+R", body)
    if not m:
        raise ValueError(f"PDF key {key.decode()} not found")
    return int(m.group(1))


def _stream_bytes(body: bytes) -> bytes:
    m = re.search(rb"stream\r?\n", body)
    if not m:
        raise ValueError("content object without stream")
    lm = re.search(rb"/Length\s+(\d+)\b(?!\s+0\s+R)", body[: m.start()])
    if lm:
        # authoritative: /Length counts the exact data bytes, so a
        # payload that happens to END in 0x0A is never truncated by the
        # trailing-EOL heuristic below
        data = body[m.end() : m.end() + int(lm.group(1))]
    else:
        end = body.rfind(b"endstream")
        if end < 0:
            raise ValueError("unterminated stream")
        data = body[m.end() : end]
        if data.endswith(b"\r\n"):
            data = data[:-2]
        elif data.endswith(b"\n"):
            data = data[:-1]
    if b"/FlateDecode" in body[: m.start()]:
        data = zlib.decompress(data)
    return data


def _parse_string(data: bytes, i: int) -> tuple[str, int]:
    """Literal string starting at ``data[i] == '('`` -> (text, next)."""
    out: list[str] = []
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i : i + 1]
        if c == b"\\":
            nxt = data[i + 1 : i + 2].decode("latin-1")
            if nxt.isdigit():  # octal escape, 1-3 digits
                j = i + 1
                while j < min(i + 4, n) and data[j : j + 1].isdigit():
                    j += 1
                out.append(chr(int(data[i + 1 : j], 8)))
                i = j
                continue
            out.append(_UNESC.get(nxt, nxt))
            i += 2
            continue
        if c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                return "".join(out), i + 1
        out.append(c.decode("latin-1"))
        i += 1
    raise ValueError("unterminated PDF string")


_NUM_RE = re.compile(rb"[-+0-9.]")


def _page_text(content: bytes) -> list[str]:
    """Content-stream tokenizer -> text lines (Td/TD/T* break lines)."""
    lines: list[list[str]] = [[]]
    pending: list[str] = []  # string operands awaiting their operator
    i, n = 0, len(content)
    started = False
    while i < n:
        c = content[i : i + 1]
        if c in b" \t\r\n[]":
            i += 1
        elif c == b"(":
            s, i = _parse_string(content, i)
            pending.append(s)
        elif c == b"<" and content[i + 1 : i + 2] != b"<":
            j = content.find(b">", i)
            if j < 0:
                raise ValueError("unterminated hex string")
            hx = re.sub(rb"\s", b"", content[i + 1 : j])
            if len(hx) % 2:
                hx += b"0"
            pending.append(bytes.fromhex(hx.decode("ascii")).decode("latin-1"))
            i = j + 1
        elif c == b"<":  # dict inside content (rare) — skip
            i += 2
        elif _NUM_RE.match(c):
            j = i
            while j < n and _NUM_RE.match(content[j : j + 1]):
                j += 1
            i = j
        else:  # operator / name token
            j = i
            while j < n and content[j : j + 1] not in b" \t\r\n[]()<>/":
                j += 1
            op = content[i:j] if j > i else content[i : i + 1]
            i = j if j > i else i + 1
            if op in (b"Td", b"TD", b"T*", b"'", b'"'):
                if started:
                    lines.append([])
                if op in (b"'", b'"') and pending:
                    started = True
                    lines[-1].append(pending[-1])
                pending.clear()
            elif op in (b"Tj", b"TJ"):
                started = True
                lines[-1].extend(pending)
                pending.clear()
            elif op == b"ET":
                pending.clear()
            elif op == b"/":  # name token: skip the name body
                while i < n and content[i : i + 1] not in b" \t\r\n[]()<>/":
                    i += 1
            else:
                pending.clear()  # operands consumed by a non-text op
    # the first Td precedes any text; drop a leading empty line artifact
    return ["".join(parts) for parts in lines if parts or len(lines) == 1]


def decode_pdf_text(payload: bytes) -> list[str]:
    """PDF bytes -> one text string per page (lines joined by ``\\n``)."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload (missing %PDF- header)")
    objs = _objects(payload)
    trailer_at = payload.rfind(b"trailer")
    if trailer_at < 0:
        raise ValueError("PDF without trailer")
    root = _ref(payload[trailer_at:], b"/Root")
    pages_obj = _ref(objs[root], b"/Pages")
    kids_m = re.search(rb"/Kids\s*\[((?:\s*\d+\s+0\s+R)+)\s*\]", objs[pages_obj])
    if not kids_m:
        raise ValueError("PDF page tree without /Kids")
    page_ids = [int(x) for x in re.findall(rb"(\d+)\s+0\s+R", kids_m.group(1))]
    out = []
    for pid in page_ids:
        content_id = _ref(objs[pid], b"/Contents")
        out.append("\n".join(_page_text(_stream_bytes(objs[content_id]))))
    return out
