"""From-scratch baseline TIFF codec — pure Python/numpy, no codec libs.

Fourth real compressed-image container next to PNG, baseline JPEG and
GIF (the reference delegates all compressed decode to sharp —
examples/node-cli/ocr.js:10-18 — whose format list includes TIFF; here
the container is implemented from the public TIFF 6.0 specification).

Scope:

- decode: II (little-endian) and MM (big-endian) byte orders, first
  IFD, 8-bit grayscale / RGB / RGBA, strip organization (any
  RowsPerStrip), Compression 1 (none), 32773 (PackBits RLE) and 5
  (TIFF-flavor LZW: MSB-first bit packing, EARLY code-width change at
  2^w - 1 — both deliberately different from GIF's LZW, which is
  LSB-first with late change), horizontal-differencing Predictor 2,
  WhiteIsZero inversion.
- encode: single-strip 8-bit gray or RGB(A), PackBits or LZW
  compression, little-endian — used by the media_decode query so the
  decoder runs on genuinely compressed payloads.

LZW expansion reuses the position-reference trick from gifcodec: each
dictionary entry is a contiguous slice of already-decoded output, so
expansion is a numpy slice copy per CODE, not per byte.
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PREDICTOR = 317

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


# ---------------------------------------------------------------------------
# PackBits (TIFF 6.0 section 9)
# ---------------------------------------------------------------------------


def _packbits_decode(data: bytes, n_out: int) -> np.ndarray:
    out = np.empty(n_out, np.uint8)
    src = np.frombuffer(data, np.uint8)
    i = o = 0
    while o < n_out and i < len(src):
        n = int(src[i])
        i += 1
        if n < 128:  # literal run of n+1 bytes
            ln = n + 1
            out[o : o + ln] = src[i : i + ln]
            i += ln
            o += ln
        elif n > 128:  # repeat next byte 257-n times
            ln = 257 - n
            out[o : o + ln] = src[i]
            i += 1
            o += ln
        # n == 128: noop
    if o < n_out:
        raise ValueError(f"PackBits stream ended early ({o}/{n_out} bytes)")
    return out


def _packbits_encode(row: np.ndarray) -> bytes:
    """Per-row PackBits (runs never cross rows, per the spec's
    recommendation).  Vectorized run-length detection; the loop is per
    RUN, not per byte."""
    out = bytearray()
    n = len(row)
    if n == 0:
        return b""
    # run boundaries
    change = np.r_[True, row[1:] != row[:-1]]
    starts = np.flatnonzero(change)
    lengths = np.diff(np.r_[starts, n])
    i = 0
    lit_start = None
    while i < len(starts):
        s, ln = int(starts[i]), int(lengths[i])
        if ln >= 3:  # worth a replicate run
            if lit_start is not None:
                _emit_literal(out, row, lit_start, s)
                lit_start = None
            while ln > 0:
                take = min(ln, 128)
                if take == 1:
                    # a 1-byte tail of a long run (length ≡ 1 mod 128)
                    # cannot be a replicate (257-1 overflows a byte) —
                    # emit it as a single-byte literal
                    out.append(0)
                    out.append(int(row[s]))
                else:
                    out.append(257 - take)
                    out.append(int(row[s]))
                ln -= take
        else:
            if lit_start is None:
                lit_start = s
        i += 1
    if lit_start is not None:
        _emit_literal(out, row, lit_start, n)
    return bytes(out)


def _emit_literal(out: bytearray, row: np.ndarray, a: int, b: int) -> None:
    while a < b:
        take = min(b - a, 128)
        out.append(take - 1)
        out += row[a : a + take].tobytes()
        a += take


# ---------------------------------------------------------------------------
# TIFF-flavor LZW (TIFF 6.0 section 13): MSB-first, early change
# ---------------------------------------------------------------------------

_CLEAR = 256
_EOI = 257


def _lzw_decode_tiff(data: bytes, n_out: int) -> np.ndarray:
    # MSB-first bit reader: one 3-byte big-endian window per code
    # (7 pad + 12 code = 19 bits <= 24) — a single C-level int op
    # instead of a numpy slice+dot per code.
    buf = data + b"\x00\x00"
    n_bits = len(data) * 8
    pos = 0
    width = 9
    start = np.zeros(4096, np.int64)
    length = np.zeros(4096, np.int64)
    length[:256] = 1
    next_code = _EOI + 1
    out = np.empty(n_out, np.uint8)
    n_written = 0
    prev = -1
    prev_at = 0

    while n_written < n_out:
        if pos + width > n_bits:
            break
        i = pos >> 3
        code = (
            int.from_bytes(buf[i : i + 3], "big") >> (24 - width - (pos & 7))
        ) & ((1 << width) - 1)
        pos += width
        if code == _CLEAR:
            next_code = _EOI + 1
            width = 9
            prev = -1
            continue
        if code == _EOI:
            break
        at = n_written
        if code < 256:
            out[n_written] = code
            n_written += 1
        elif code < next_code:
            s, ln = start[code], length[code]
            take = min(ln, n_out - n_written)
            out[n_written : n_written + take] = out[s : s + take]
            n_written += take
        elif prev >= 0 and code == next_code:  # KwKwK
            ln = length[prev] + 1
            take = min(ln - 1, n_out - n_written)
            out[n_written : n_written + take] = out[prev_at : prev_at + take]
            n_written += take
            if n_written < n_out:
                out[n_written] = out[prev_at]
            n_written += 1
        else:
            raise ValueError(f"corrupt TIFF-LZW stream: code {code}")
        if prev >= 0 and next_code < 4096:
            start[next_code] = prev_at
            length[next_code] = length[prev] + 1
            next_code += 1
        prev, prev_at = code, at
        # EARLY CHANGE: the width grows one code sooner than GIF
        if next_code >= (1 << width) - 1 and width < 12:
            width += 1
    if n_written < n_out:
        raise ValueError(f"TIFF-LZW ended early ({n_written}/{n_out} bytes)")
    return out


def _lzw_encode_tiff(data: np.ndarray) -> bytes:
    codes: list[int] = [_CLEAR]
    widths: list[int] = [9]
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = _EOI + 1
    width = 9
    buf = b""
    for byte in data.tobytes():
        cand = buf + bytes([byte])
        if cand in table:
            buf = cand
            continue
        codes.append(table[buf])
        widths.append(width)
        if next_code < 4094:  # spec: clear at 4094 to stay in 12 bits
            table[cand] = next_code
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
            next_code += 1
        else:
            codes.append(_CLEAR)
            widths.append(width)
            table = {bytes([i]): i for i in range(256)}
            next_code = _EOI + 1
            width = 9
        buf = bytes([byte])
    if buf:
        codes.append(table[buf])
        widths.append(width)
    codes.append(_EOI)
    widths.append(width)
    total = sum(widths)
    bits = np.zeros(total, np.uint8)
    at = 0
    for code, wdt in zip(codes, widths):
        for b in range(wdt):  # MSB first
            bits[at + b] = (code >> (wdt - 1 - b)) & 1
        at += wdt
    return np.packbits(bits).tobytes()


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def decode_tiff(payload: bytes) -> np.ndarray:
    """Decode the first IFD of a TIFF -> (H, W, C) uint8 (C = 1/3/4)."""
    if payload[:2] == b"II":
        bo = "<"
    elif payload[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError(f"not a TIFF payload ({payload[:2]!r})")
    magic, ifd_off = struct.unpack(bo + "HI", payload[2:8])
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")

    (n_entries,) = struct.unpack_from(bo + "H", payload, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        tag, typ, cnt, _ = struct.unpack_from(
            bo + "HHII", payload, ifd_off + 2 + i * 12
        )
        size = _TYPE_SIZE.get(typ, 1) * cnt
        val_off = ifd_off + 2 + i * 12 + 8
        if size > 4:
            (val_off,) = struct.unpack_from(bo + "I", payload, val_off)
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
        if fmt is None:
            continue  # rational/ascii tags are irrelevant here
        tags[tag] = list(struct.unpack_from(bo + fmt * cnt, payload, val_off))

    w = tags[_TAG_WIDTH][0]
    h = tags[_TAG_LENGTH][0]
    spp = tags.get(_TAG_SPP, [1])[0]
    bits = tags.get(_TAG_BITS, [8])
    if any(b != 8 for b in bits):
        raise ValueError(f"only 8-bit TIFF supported, got bits {bits}")
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    photo = tags.get(_TAG_PHOTOMETRIC, [1])[0]
    pred = tags.get(_TAG_PREDICTOR, [1])[0]
    rps = tags.get(_TAG_ROWS_PER_STRIP, [h])[0]
    offsets = tags[_TAG_STRIP_OFFSETS]
    counts = tags[_TAG_STRIP_COUNTS]

    row_bytes = w * spp
    chunks = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        rows_here = min(rps, h - si * rps)
        raw = payload[off : off + cnt]
        if comp == 1:
            strip = np.frombuffer(raw, np.uint8, rows_here * row_bytes)
        elif comp == 32773:
            strip = _packbits_decode(raw, rows_here * row_bytes)
        elif comp == 5:
            strip = _lzw_decode_tiff(raw, rows_here * row_bytes)
        else:
            raise ValueError(f"unsupported TIFF compression {comp}")
        chunks.append(strip)
    img = np.concatenate(chunks).reshape(h, w, spp)
    if pred == 2:  # horizontal differencing: integrate along the row
        img = np.cumsum(img.astype(np.int64), axis=1).astype(np.uint8)
    elif pred != 1:
        raise ValueError(f"unsupported TIFF predictor {pred}")
    if photo == 0:  # WhiteIsZero
        img = 255 - img
    return np.ascontiguousarray(img)


def encode_tiff(
    img: np.ndarray, compression: str = "lzw", predictor: bool = False
) -> bytes:
    """(H, W, 1|3|4) uint8 -> single-strip little-endian TIFF with
    PackBits ('packbits'), TIFF-LZW ('lzw') or no ('none') compression.
    """
    h, w, c = img.shape
    if c not in (1, 3, 4):
        raise ValueError(f"TIFF encode needs 1/3/4 channels, got {c}")
    data = img
    if predictor:
        d = img.astype(np.int16)
        data = np.concatenate([d[:, :1], np.diff(d, axis=1)], axis=1).astype(
            np.uint8
        )
    flat = data.reshape(h, w * c)
    if compression == "none":
        comp_id, stream = 1, flat.tobytes()
    elif compression == "packbits":
        comp_id = 32773
        stream = b"".join(_packbits_encode(flat[r]) for r in range(h))
    elif compression == "lzw":
        comp_id, stream = 5, _lzw_encode_tiff(flat.ravel())
    else:
        raise ValueError(f"unknown compression {compression!r}")

    photo = 1 if c == 1 else 2
    entries = [
        (_TAG_WIDTH, 4, 1, w),
        (_TAG_LENGTH, 4, 1, h),
        (_TAG_BITS, 3, c, None),  # needs external storage when c > 2
        (_TAG_COMPRESSION, 3, 1, comp_id),
        (_TAG_PHOTOMETRIC, 3, 1, photo),
        (_TAG_STRIP_OFFSETS, 4, 1, None),  # patched below
        (_TAG_SPP, 3, 1, c),
        (_TAG_ROWS_PER_STRIP, 4, 1, h),
        (_TAG_STRIP_COUNTS, 4, 1, len(stream)),
        (_TAG_PREDICTOR, 3, 1, 2 if predictor else 1),
    ]
    ifd_off = 8
    ifd_size = 2 + len(entries) * 12 + 4
    extra_off = ifd_off + ifd_size
    extra = b""
    bits_val: int | None
    if c > 2:
        bits_val = extra_off  # offset to the SHORT array
        extra = struct.pack("<" + "H" * c, *([8] * c))
    else:
        bits_val = 8
    strip_off = extra_off + len(extra)

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_off)
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if tag == _TAG_BITS:
            val = bits_val
        elif tag == _TAG_STRIP_OFFSETS:
            val = strip_off
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)  # no next IFD
    out += extra
    out += stream
    return bytes(out)
