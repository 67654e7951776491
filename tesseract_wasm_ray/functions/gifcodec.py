"""From-scratch GIF (GIF87a/89a) codec — pure Python/numpy, no codec
libs.  GIF is the third REAL compressed-format branch next to the PNG
and baseline-JPEG codecs (the reference delegates all compressed decode
to sharp / createImageBitmap — examples/node-cli/ocr.js:10-18,
src/utils.ts:4-21; here the container itself is implemented from the
public GIF89a specification).

Scope (everything the synthetic corpus and a plain single-frame GIF
need):

- decode: header + logical screen descriptor, global/local color
  tables, extension-block skipping (graphic control, comment,
  application), ONE image frame, interlaced or sequential, full LZW
  decompression (variable code width 3..12 bits, LSB-first packing,
  clear/EOI codes, dictionary growth to 4096 with mid-stream resets).
- encode: single-frame GIF89a with a 256-entry palette and real LZW
  compression (dictionary to 4096 + clear-code reset) — used by the
  media_decode query to wrap grayscale fixture pages so the decoder is
  exercised on genuinely compressed payloads.

A decoded frame whose active palette is purely gray (r==g==b for every
referenced entry) is returned as (H, W, 1) so the media pipeline's
channel metadata round-trips; anything else comes back (H, W, 3).
"""

from __future__ import annotations

import struct

import numpy as np

_TRAILER = 0x3B
_IMAGE_SEP = 0x2C
_EXTENSION = 0x21


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-flavor LZW: codes are packed LSB-first, start at
    ``min_code_size + 1`` bits, grow after the dictionary fills the
    current width, and reset on the clear code.  Returns uint8 indices.

    Expansion uses the position-reference trick: every dictionary
    entry's string is, by construction, a CONTIGUOUS slice of the
    already-decoded output (entry = prev's string + the first byte of
    the string decoded right after it), so the table stores (position,
    length) into ``out`` and each code expands as one numpy slice copy
    — the Python loop runs per CODE, not per pixel."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reader over the whole concatenated sub-block stream: one
    # 3-byte little-endian window per code (7 pad + 12 code = 19 bits
    # <= 24) — a single C-level int op instead of a numpy slice+dot.
    buf = data + b"\x00\x00"
    pos = 0
    width = min_code_size + 1
    n_bits = len(data) * 8

    # dictionary entry = slice of out: (start position, length);
    # roots are synthesized inline
    start = np.zeros(4096, np.int64)
    length = np.zeros(4096, np.int64)
    length[:clear] = 1
    next_code = eoi + 1

    out = np.empty(n_pixels, np.uint8)
    n_out = 0
    prev = -1
    prev_at = 0  # where prev's expansion was written

    while n_out < n_pixels:
        if pos + width > n_bits:
            break  # truncated stream; raise below if pixels are missing
        i = pos >> 3
        code = (
            int.from_bytes(buf[i : i + 3], "little") >> (pos & 7)
        ) & ((1 << width) - 1)
        pos += width
        if code == clear:
            next_code = eoi + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            break
        at = n_out
        if code < clear:  # root: single literal byte
            out[n_out] = code
            n_out += 1
        elif code < next_code:
            s, ln = start[code], length[code]
            take = min(ln, n_pixels - n_out)
            out[n_out : n_out + take] = out[s : s + take]
            n_out += take
        elif prev >= 0 and code == next_code:  # KwKwK
            # string = prev's string + its own first byte; prev's bytes
            # end exactly at n_out, so source and dest never overlap
            ln = length[prev] + 1
            src = prev_at
            take = min(ln - 1, n_pixels - n_out)
            out[n_out : n_out + take] = out[src : src + take]
            n_out += take
            if n_out < n_pixels:
                out[n_out] = out[src]
            n_out += 1
        else:
            raise ValueError(f"corrupt LZW stream: code {code} > {next_code}")
        if prev >= 0 and next_code < 4096:
            # new entry = prev's string + first byte of this one —
            # contiguous at prev_at because this string was written
            # immediately after prev's
            start[next_code] = prev_at
            length[next_code] = length[prev] + 1
            next_code += 1
        prev, prev_at = code, at
        if next_code >= (1 << width) and width < 12:
            width += 1
    if n_out < n_pixels:
        raise ValueError(f"LZW stream ended early ({n_out}/{n_pixels} pixels)")
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Real LZW compression (string-table dict, clear-code reset at
    4096).  O(n_pixels) Python loop — acceptable because encoding only
    happens when fixtures wrap pages, never in the decode hot path."""
    clear = 1 << min_code_size
    eoi = clear + 1
    codes: list[int] = [clear]
    widths: list[int] = []
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    widths.append(width)

    buf = b""
    for px in indices.tobytes():
        cand = buf + bytes([px])
        if cand in table:
            buf = cand
            continue
        codes.append(table[buf])
        widths.append(width)
        if next_code < 4096:
            table[cand] = next_code
            # the DECODER grows its width after creating the entry that
            # fills the current range, so the encoder must bump width
            # when next_code reaches the range end
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            codes.append(clear)
            widths.append(width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        buf = bytes([px])
    if buf:
        codes.append(table[buf])
        widths.append(width)
    codes.append(eoi)
    widths.append(width)

    # pack LSB-first
    total_bits = sum(widths)
    bits = np.zeros(total_bits, np.uint8)
    at = 0
    for code, wdt in zip(codes, widths):
        for b in range(wdt):
            bits[at + b] = (code >> b) & 1
        at += wdt
    return np.packbits(bits, bitorder="little").tobytes()


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_GRAY_PALETTE = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)


def encode_gif(img: np.ndarray) -> bytes:
    """(H, W, 1) uint8 gray -> single-frame GIF89a with the identity
    gray palette and real LZW compression."""
    if img.ndim != 3 or img.shape[2] != 1:
        raise ValueError(f"GIF encode expects (H, W, 1) gray, got {img.shape}")
    h, w, _ = img.shape
    out = bytearray()
    out += b"GIF89a"
    # logical screen: GCT present, 8 bits/channel, 256-entry table
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += _GRAY_PALETTE.tobytes()
    # image descriptor: full frame, no LCT, not interlaced
    out += struct.pack("<BHHHHB", _IMAGE_SEP, 0, 0, w, h, 0)
    out.append(8)  # LZW min code size
    stream = _lzw_encode(img.ravel(), 8)
    for i in range(0, len(stream), 255):
        block = stream[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)  # block terminator
    out.append(_TRAILER)
    return bytes(out)


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """GIF 4-pass interlace: rows arrive 8k, 8k+4, 4k+2, 2k+1."""
    h = rows.shape[0]
    order = np.r_[
        np.arange(0, h, 8),
        np.arange(4, h, 8),
        np.arange(2, h, 4),
        np.arange(1, h, 2),
    ]
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the first frame of a GIF87a/89a -> (H, W, 1) uint8 when
    the referenced palette entries are all gray, else (H, W, 3) RGB."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"not a GIF payload ({payload[:6]!r})")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == _EXTENSION:
            pos += 1  # label
            while payload[pos]:  # skip sub-blocks
                pos += 1 + payload[pos]
            pos += 1
        elif block == _IMAGE_SEP:
            left, top, w, h, ipacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
            pos += 9
            palette = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                palette = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if palette is None:
                raise ValueError("GIF frame has no color table")
            min_code = payload[pos]
            pos += 1
            chunks = []
            while payload[pos]:
                ln = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(b"".join(chunks), min_code, w * h).reshape(h, w)
            if ipacked & 0x40:
                idx = _deinterlace(idx)
            used = palette[: idx.max() + 1]
            if bool(np.all(used[:, 0] == used[:, 1]) and np.all(used[:, 1] == used[:, 2])):
                return np.ascontiguousarray(palette[idx][:, :, :1])
            return np.ascontiguousarray(palette[idx])
        elif block == _TRAILER:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x} at {pos - 1}")
    raise ValueError("GIF contained no image frame")
