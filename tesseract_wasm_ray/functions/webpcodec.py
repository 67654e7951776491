"""From-scratch WebP-lossless (VP8L) codec — pure Python + numpy.

Implements the public "WebP Lossless Bitstream Specification" with no
codec libraries: an LSB-first bit reader/writer, canonical prefix
(Huffman) codes (both the "simple" and the normal code-length-coded
form), LZ77 backward references with the 2-D distance-neighborhood
mapping, the color cache, meta prefix-code groups, and all four
inverse transforms (predictor with its 14 modes, color transform,
subtract-green, color-indexing with sub-byte pixel bundling).

The encoder emits a valid, deliberately simple subset — optional
subtract-green, per-image prefix codes (simple where possible), an
optional color cache, and run-length LZ77 (distance 1) — enough to
compress the engine's synthetic pages losslessly while keeping the
writer auditable.  The decoder handles the full feature grid, which
the tests exercise with hand-assembled streams (predictor / color /
palette transforms, neighborhood distance codes, meta groups).

Layout reference: RIFF 'WEBP' container wrapping one 'VP8L' chunk.
Lossy VP8 and extended VP8X payloads raise ``ValueError`` loudly.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

# order in which code-length-code lengths are stored (spec §Normal codes)
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

_NUM_LITERALS = 256
_NUM_LENGTH_CODES = 24
_NUM_DISTANCE_CODES = 40
_MAX_COPY_LEN = 4096

# 2-D neighborhood for distance codes 1..120: (dx, dy), ordered by
# proximity per the spec's distance-mapping table
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (8, 3), (-8, 3), (5, 7), (-5, 7), (7, 5),
    (-7, 5), (8, 4), (3, 8), (-3, 8), (8, 5), (-8, 5), (6, 7), (-6, 7),
    (7, 6), (-7, 6),
]


# ---------------------------------------------------------------------------
# bit I/O (LSB-first)
# ---------------------------------------------------------------------------


class BitReader:
    """LSB-first reader over an int window (one big-int slice per read
    instead of a per-bit loop — same discipline as the LZW readers in
    gifcodec/tiffcodec)."""

    def __init__(self, data: bytes):
        self._d = data
        self._pos = 0  # bit position
        self._nbits = len(data) * 8

    def read(self, n: int) -> int:
        p = self._pos
        if p + n > self._nbits:
            raise ValueError("VP8L: bitstream truncated")
        byte = p >> 3
        shift = p & 7
        chunk = int.from_bytes(self._d[byte : byte + ((n + shift + 7) >> 3)], "little")
        self._pos = p + n
        return (chunk >> shift) & ((1 << n) - 1)

    def read_bit(self) -> int:
        p = self._pos
        if p >= self._nbits:
            raise ValueError("VP8L: bitstream truncated")
        self._pos = p + 1
        return (self._d[p >> 3] >> (p & 7)) & 1


class BitWriter:
    def __init__(self):
        self._bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self._bits.append((value >> i) & 1)

    def write_bit(self, b: int) -> None:
        self._bits.append(b & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self._bits) + 7) // 8)
        for i, b in enumerate(self._bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------


class HuffTree:
    """Canonical prefix code built from code lengths.  Codes are read
    MSB-first (each bit descends the tree).  A tree with exactly one
    used symbol consumes ZERO bits per read (libwebp convention for
    both simple 1-symbol codes and degenerate normal codes)."""

    def __init__(self, lengths: list[int]):
        used = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not used:
            raise ValueError("VP8L: empty prefix code")
        if len(used) == 1:
            self.single = used[0][1]
            self.codes = {used[0][1]: (0, 0)}
            return
        self.single = None
        used.sort()
        # DEFLATE-style canonical assignment
        max_len = used[-1][0]
        bl_count = [0] * (max_len + 1)
        for l, _ in used:
            bl_count[l] += 1
        next_code = [0] * (max_len + 2)
        code = 0
        for l in range(1, max_len + 1):
            code = (code + bl_count[l - 1]) << 1
            next_code[l] = code
        self.codes = {}  # symbol -> (code, length)
        # decode structures: per length, first code and symbol slice
        self._first_code = [0] * (max_len + 1)
        self._first_idx = [0] * (max_len + 1)
        self._count = bl_count
        self._symbols = [s for _, s in used]
        idx = 0
        for l in range(1, max_len + 1):
            self._first_code[l] = next_code[l]
            self._first_idx[l] = idx
            idx += bl_count[l]
        for l, s in used:
            self.codes[s] = (next_code[l], l)
            next_code[l] += 1
        self.max_len = max_len

    def decode(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for l in range(1, self.max_len + 1):
            code = (code << 1) | br.read_bit()
            off = code - self._first_code[l]
            if 0 <= off < self._count[l]:
                return self._symbols[self._first_idx[l] + off]
        raise ValueError("VP8L: invalid prefix code in stream")

    def encode(self, bw: BitWriter, symbol: int) -> None:
        code, length = self.codes[symbol]
        for i in range(length - 1, -1, -1):  # MSB-first
            bw.write_bit((code >> i) & 1)


def _huffman_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Symbol -> code length via package-style Huffman; depths are
    limited by iteratively flattening frequencies (adequate for the
    encoder's small alphabets)."""
    syms = [s for s, f in freqs.items() if f > 0]
    if not syms:
        raise ValueError("no symbols")
    if len(syms) == 1:
        return {syms[0]: 1}
    f = {s: freqs[s] for s in syms}
    while True:
        heap = [(fv, i, (s,)) for i, (s, fv) in enumerate(sorted(f.items()))]
        heapq.heapify(heap)
        depth = dict.fromkeys(syms, 0)
        i = len(heap)
        while len(heap) > 1:
            fa, _, sa = heapq.heappop(heap)
            fb, _, sb = heapq.heappop(heap)
            for s in sa + sb:
                depth[s] += 1
            heapq.heappush(heap, (fa + fb, i, sa + sb))
            i += 1
        if max(depth.values()) <= max_len:
            return depth
        f = {s: (fv + 1) // 2 for s, fv in f.items()}


# ---------------------------------------------------------------------------
# prefix (length / distance) value coding
# ---------------------------------------------------------------------------


def _prefix_decode(code: int, br: BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value (>=1) -> (prefix_code, n_extra_bits, extra_value)."""
    if value <= 4:
        return value - 1, 0, 0
    x = value - 1
    n = x.bit_length()
    extra = n - 2
    second = (x >> (n - 2)) & 1
    code = 2 * extra + 2 + second
    offset = (2 + second) << extra
    return code, extra, value - offset - 1


# ---------------------------------------------------------------------------
# prefix-code (de)serialization
# ---------------------------------------------------------------------------


def _read_code(br: BitReader, alphabet_size: int) -> HuffTree:
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        if br.read_bit():  # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 2:
            sym1 = br.read(8)
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            lengths[sym0] = 1
        return HuffTree(lengths)
    # normal code: code-length code first
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_tree = HuffTree(cl_lengths)
    lengths = [0] * alphabet_size
    if br.read_bit():  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = cl_tree.decode(br)
        if s < 16:
            lengths[symbol] = s
            symbol += 1
            if s != 0:
                prev_len = s
        elif s == 16:
            repeat = 3 + br.read(2)
            for _ in range(repeat):
                if symbol >= alphabet_size:
                    raise ValueError("VP8L: code-length repeat overflow")
                lengths[symbol] = prev_len
                symbol += 1
        elif s == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
    if symbol > alphabet_size:
        raise ValueError("VP8L: code-length repeat overflow")
    return HuffTree(lengths)


def _write_code(bw: BitWriter, lengths: dict[int, int], alphabet_size: int) -> HuffTree:
    """Serialize code lengths; returns the tree for symbol encoding."""
    syms = sorted(lengths)
    if len(syms) <= 2 and all(s <= 255 for s in syms):
        bw.write_bit(1)  # simple
        bw.write_bit(len(syms) - 1)  # num_symbols - 1
        if syms[0] <= 1:
            bw.write_bit(0)
            bw.write(syms[0], 1)
        else:
            bw.write_bit(1)
            bw.write(syms[0], 8)
        if len(syms) == 2:
            bw.write(syms[1], 8)
        full = [0] * alphabet_size
        for s in syms:
            full[s] = 1
        return HuffTree(full)
    bw.write_bit(0)  # normal
    full = [0] * alphabet_size
    for s, l in lengths.items():
        full[s] = l
    # literal-only code-length stream (no 16/17/18 repeats; 0-runs are
    # spelled out — simple and valid, sized for the engine's images)
    cl_freq: dict[int, int] = {}
    for l in full:
        cl_freq[l] = cl_freq.get(l, 0) + 1
    cl_lengths = _huffman_lengths(cl_freq, max_len=7)
    cl_full = [0] * 19
    for s, l in cl_lengths.items():
        cl_full[s] = l
    # emit in _CL_ORDER, trimmed to the last nonzero entry (min 4)
    order_lengths = [cl_full[s] for s in _CL_ORDER]
    num_cl = max(4, max(i + 1 for i, l in enumerate(order_lengths) if l > 0))
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(order_lengths[i], 3)
    cl_tree = HuffTree(cl_full)
    bw.write_bit(0)  # no max_symbol shortcut
    for l in full:
        cl_tree.encode(bw, l)
    return HuffTree(full)


# ---------------------------------------------------------------------------
# entropy-coded image decode
# ---------------------------------------------------------------------------


def _cache_key(argb, bits: int) -> int:
    return ((0x1E35A7BD * int(argb)) & 0xFFFFFFFF) >> (32 - bits)


def _decode_entropy_image(
    br: BitReader, width: int, height: int, allow_meta: bool
) -> np.ndarray:
    """Decode a (spatially- or entropy-coded) image into a uint32 ARGB
    array of shape (height, width)."""
    cache_bits = 0
    cache = None
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L: invalid color-cache bits {cache_bits}")
        cache = np.zeros(1 << cache_bits, np.uint32)

    meta = None
    meta_bits = 0
    num_groups = 1
    if allow_meta and br.read_bit():
        meta_bits = br.read(3) + 2
        mw = (width + (1 << meta_bits) - 1) >> meta_bits
        mh = (height + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_entropy_image(br, mw, mh, allow_meta=False)
        meta = (
            ((meta_img >> np.uint32(16)) & np.uint32(0xFF)) << np.uint32(8)
        ) | ((meta_img >> np.uint32(8)) & np.uint32(0xFF))
        num_groups = int(meta.max()) + 1

    green_alpha = _NUM_LITERALS + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(num_groups):
        groups.append(
            (
                _read_code(br, green_alpha),
                _read_code(br, _NUM_LITERALS),  # red
                _read_code(br, _NUM_LITERALS),  # blue
                _read_code(br, _NUM_LITERALS),  # alpha
                _read_code(br, _NUM_DISTANCE_CODES),
            )
        )

    n = width * height
    pix = np.zeros(n, np.uint32)
    pos = 0
    while pos < n:
        if meta is not None:
            x, y = pos % width, pos // width
            g = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        else:
            g = groups[0]
        green_t, red_t, blue_t, alpha_t, dist_t = g
        s = green_t.decode(br)
        if s < _NUM_LITERALS:
            green = s
            red = red_t.decode(br)
            blue = blue_t.decode(br)
            alpha = alpha_t.decode(br)
            v = (alpha << 24) | (red << 16) | (green << 8) | blue
            pix[pos] = v
            if cache is not None:
                cache[_cache_key(np.uint32(v), cache_bits)] = v
            pos += 1
        elif s < _NUM_LITERALS + _NUM_LENGTH_CODES:
            length = _prefix_decode(s - _NUM_LITERALS, br)
            dist_code = _prefix_decode(dist_t.decode(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * width + dx
                if dist < 1:
                    dist = 1
            if dist > pos:
                raise ValueError("VP8L: backward reference before image start")
            if pos + length > n:
                raise ValueError("VP8L: backward reference past image end")
            if cache is None:
                # overlap-safe vectorized copy (period = dist)
                end = pos + length
                while pos < end:
                    step = min(dist, end - pos)
                    pix[pos : pos + step] = pix[pos - dist : pos - dist + step]
                    pos += step
            else:
                for _ in range(length):
                    v = pix[pos - dist]
                    pix[pos] = v
                    cache[_cache_key(v, cache_bits)] = int(v)
                    pos += 1
        else:
            if cache is None:
                raise ValueError("VP8L: cache index without color cache")
            pix[pos] = cache[s - _NUM_LITERALS - _NUM_LENGTH_CODES]
            pos += 1
    return pix.reshape(height, width)


# ---------------------------------------------------------------------------
# inverse transforms
# ---------------------------------------------------------------------------


def _chan(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _predict(mode: int, L: int, T: int, TL: int, TR: int) -> int:
    la, lr, lg, lb = _chan(L)
    ta, tr_, tg, tb = _chan(T)
    tla, tlr, tlg, tlb = _chan(TL)
    tra, trr, trg, trb = _chan(TR)
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return (
            (_avg2(_avg2(la, tra), ta) << 24)
            | (_avg2(_avg2(lr, trr), tr_) << 16)
            | (_avg2(_avg2(lg, trg), tg) << 8)
            | _avg2(_avg2(lb, trb), tb)
        )
    if mode == 6:
        return (
            (_avg2(la, tla) << 24) | (_avg2(lr, tlr) << 16)
            | (_avg2(lg, tlg) << 8) | _avg2(lb, tlb)
        )
    if mode == 7:
        return (
            (_avg2(la, ta) << 24) | (_avg2(lr, tr_) << 16)
            | (_avg2(lg, tg) << 8) | _avg2(lb, tb)
        )
    if mode == 8:
        return (
            (_avg2(tla, ta) << 24) | (_avg2(tlr, tr_) << 16)
            | (_avg2(tlg, tg) << 8) | _avg2(tlb, tb)
        )
    if mode == 9:
        return (
            (_avg2(ta, tra) << 24) | (_avg2(tr_, trr) << 16)
            | (_avg2(tg, trg) << 8) | _avg2(tb, trb)
        )
    if mode == 10:
        return (
            (_avg2(_avg2(la, tla), _avg2(ta, tra)) << 24)
            | (_avg2(_avg2(lr, tlr), _avg2(tr_, trr)) << 16)
            | (_avg2(_avg2(lg, tlg), _avg2(tg, trg)) << 8)
            | _avg2(_avg2(lb, tlb), _avg2(tb, trb))
        )
    if mode == 11:  # Select
        pa = la + ta - tla
        pr = lr + tr_ - tlr
        pg = lg + tg - tlg
        pb = lb + tb - tlb
        p_l = abs(pa - la) + abs(pr - lr) + abs(pg - lg) + abs(pb - lb)
        p_t = abs(pa - ta) + abs(pr - tr_) + abs(pg - tg) + abs(pb - tb)
        return L if p_l < p_t else T
    if mode == 12:  # ClampAddSubtractFull
        return (
            (_clamp(la + ta - tla) << 24)
            | (_clamp(lr + tr_ - tlr) << 16)
            | (_clamp(lg + tg - tlg) << 8)
            | _clamp(lb + tb - tlb)
        )
    if mode == 13:  # ClampAddSubtractHalf

        def half(a: int, b: int) -> int:
            d = a - b
            q = d // 2 if d >= 0 else -((-d) // 2)  # C truncation
            return _clamp(a + q)

        return (
            (half(_avg2(la, ta), tla) << 24)
            | (half(_avg2(lr, tr_), tlr) << 16)
            | (half(_avg2(lg, tg), tlg) << 8)
            | half(_avg2(lb, tb), tlb)
        )
    raise ValueError(f"VP8L: invalid predictor mode {mode}")


def _inv_predictor(pix: np.ndarray, modes: np.ndarray, size_bits: int) -> None:
    h, w = pix.shape
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                mode = 0
            elif y == 0:
                mode = 1  # left
            elif x == 0:
                mode = 2  # top
            else:
                mode = int((modes[y >> size_bits, x >> size_bits] >> 8) & 0xFF)
            L = int(pix[y, x - 1]) if x > 0 else 0
            T = int(pix[y - 1, x]) if y > 0 else 0
            TL = int(pix[y - 1, x - 1]) if (x > 0 and y > 0) else 0
            # rows are contiguous in the spec's memory model, so the
            # TR pixel of the rightmost column is the CURRENT row's
            # leftmost (already-reconstructed) pixel
            if y == 0:
                TR = 0
            elif x + 1 < w:
                TR = int(pix[y - 1, x + 1])
            else:
                TR = int(pix[y, 0])
            pred = _predict(mode, L, T, TL, TR)
            res = int(pix[y, x])
            pa, pr, pg, pb = _chan(pred)
            ra, rr, rg, rb = _chan(res)
            pix[y, x] = np.uint32(
                (((ra + pa) & 0xFF) << 24)
                | (((rr + pr) & 0xFF) << 16)
                | (((rg + pg) & 0xFF) << 8)
                | ((rb + pb) & 0xFF)
            )


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed-int8 product >> 5."""
    ts = t - 256 if t > 127 else t
    cs = c - 256 if c > 127 else c
    return (ts * cs) >> 5


def _inv_color_transform(pix: np.ndarray, elems: np.ndarray, size_bits: int) -> None:
    h, w = pix.shape
    for y in range(h):
        for x in range(w):
            e = int(elems[y >> size_bits, x >> size_bits])
            g2r = (e >> 0) & 0xFF  # blue channel of element
            g2b = (e >> 8) & 0xFF  # green channel
            r2b = (e >> 16) & 0xFF  # red channel
            p = int(pix[y, x])
            a, r, g, b = _chan(p)
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g)) & 0xFF
            b = (b + _ct_delta(r2b, r)) & 0xFF
            pix[y, x] = np.uint32((a << 24) | (r << 16) | (g << 8) | b)


def _inv_subtract_green(pix: np.ndarray) -> None:
    g = (pix >> np.uint32(8)) & np.uint32(0xFF)
    r = (((pix >> np.uint32(16)) & np.uint32(0xFF)) + g) & np.uint32(0xFF)
    b = ((pix & np.uint32(0xFF)) + g) & np.uint32(0xFF)
    pix[...] = (
        (pix & np.uint32(0xFF000000)) | (r << np.uint32(16))
        | (g << np.uint32(8)) | b
    )


# ---------------------------------------------------------------------------
# top-level decode
# ---------------------------------------------------------------------------


def _decode_vp8l(data: bytes) -> np.ndarray:
    br = BitReader(data)
    if br.read(8) != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    width = br.read(14) + 1
    height = br.read(14) + 1
    br.read_bit()  # alpha hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")

    xsize = width
    transforms = []  # applied in reverse order after decode
    seen = set()
    while br.read_bit():
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("VP8L: duplicate transform")
        seen.add(ttype)
        if ttype == 0:  # predictor
            bits = br.read(3) + 2
            bw_ = (xsize + (1 << bits) - 1) >> bits
            bh_ = (height + (1 << bits) - 1) >> bits
            modes = _decode_entropy_image(br, bw_, bh_, allow_meta=False)
            transforms.append(("predictor", bits, modes))
        elif ttype == 1:  # color transform
            bits = br.read(3) + 2
            bw_ = (xsize + (1 << bits) - 1) >> bits
            bh_ = (height + (1 << bits) - 1) >> bits
            elems = _decode_entropy_image(br, bw_, bh_, allow_meta=False)
            transforms.append(("color", bits, elems))
        elif ttype == 2:  # subtract green
            transforms.append(("subtract_green",))
        else:  # color indexing
            pal_size = br.read(8) + 1
            pal = _decode_entropy_image(br, pal_size, 1, allow_meta=False)[0]
            # palette entries are delta-coded: cumulative per-channel sum
            out = np.zeros(pal_size, np.uint32)
            prev = np.uint32(0)
            for i in range(pal_size):
                pa_, pr_, pg_, pb_ = _chan(int(prev))
                da, dr, dg, db = _chan(int(pal[i]))
                prev = np.uint32(
                    (((pa_ + da) & 0xFF) << 24) | (((pr_ + dr) & 0xFF) << 16)
                    | (((pg_ + dg) & 0xFF) << 8) | ((pb_ + db) & 0xFF)
                )
                out[i] = prev
            if pal_size <= 2:
                wbits = 3
            elif pal_size <= 4:
                wbits = 2
            elif pal_size <= 16:
                wbits = 1
            else:
                wbits = 0
            transforms.append(("palette", out, wbits, xsize))
            xsize = (xsize + (1 << wbits) - 1) >> wbits
    pix = _decode_entropy_image(br, xsize, height, allow_meta=True)

    for t in reversed(transforms):
        if t[0] == "predictor":
            _inv_predictor(pix, t[2], t[1])
        elif t[0] == "color":
            _inv_color_transform(pix, t[2], t[1])
        elif t[0] == "subtract_green":
            _inv_subtract_green(pix)
        else:  # palette
            _, pal, wbits, full_w = t
            if wbits == 0:
                idx = (pix >> np.uint32(8)) & np.uint32(0xFF)
            else:
                per = 1 << wbits  # pixels per bundle
                ib = 8 >> wbits  # bits per index
                green = ((pix >> np.uint32(8)) & np.uint32(0xFF)).astype(np.uint16)
                xs = np.arange(full_w)
                idx = (
                    green[:, xs >> wbits] >> ((xs & (per - 1)) * ib)[None, :]
                ) & ((1 << ib) - 1)
            if int(idx.max(initial=0)) >= len(pal):
                raise ValueError("VP8L: palette index out of range")
            pix = pal[idx.astype(np.int64)]
    return pix


def decode_webp(payload: bytes) -> np.ndarray:
    """WebP (lossless / VP8L) bytes -> (h, w, 4) uint8 RGBA."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP stream")
    pos, end = 12, min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"VP8L":
            pix = _decode_vp8l(body)
            h, w = pix.shape
            out = np.empty((h, w, 4), np.uint8)
            out[:, :, 0] = (pix >> np.uint32(16)) & np.uint32(0xFF)  # R
            out[:, :, 1] = (pix >> np.uint32(8)) & np.uint32(0xFF)  # G
            out[:, :, 2] = pix & np.uint32(0xFF)  # B
            out[:, :, 3] = (pix >> np.uint32(24)) & np.uint32(0xFF)  # A
            return out
        if cid in (b"VP8 ", b"VP8X"):
            raise ValueError(f"only lossless VP8L supported (found {cid!r})")
        pos += 8 + size + (size % 2)
    raise ValueError("WEBP without VP8L chunk")


# ---------------------------------------------------------------------------
# encoder (valid simple subset)
# ---------------------------------------------------------------------------


def _encode_entropy_image(
    bw: BitWriter,
    pix: np.ndarray,
    cache_bits: int = 0,
    use_rle: bool = True,
    write_meta_bit: bool = True,
) -> None:
    """Serialize a uint32 ARGB image (h, w) as an entropy-coded image:
    optional color cache, single prefix-code group, literals +
    distance-1 run-length LZ77.  ``write_meta_bit=False`` produces the
    SUBIMAGE form (transform data / meta image), which per the spec
    carries no meta-prefix bit."""
    h, w = pix.shape
    flat = pix.reshape(-1)
    n = len(flat)

    # tokenize: (kind, payload) where kind in {lit, run, cache}
    tokens = []
    cache = np.zeros(1 << cache_bits, np.uint32) if cache_bits else None
    cache_valid = np.zeros(1 << cache_bits, bool) if cache_bits else None
    i = 0
    while i < n:
        if use_rle and i > 0 and flat[i] == flat[i - 1]:
            run = 1
            while i + run < n and run < _MAX_COPY_LEN and flat[i + run] == flat[i - 1]:
                run += 1
            tokens.append(("run", run))
            if cache is not None:
                for j in range(i, i + run):
                    k = _cache_key(flat[j], cache_bits)
                    cache[k] = flat[j]
                    cache_valid[k] = True
            i += run
            continue
        v = flat[i]
        if cache is not None:
            k = _cache_key(v, cache_bits)
            if cache_valid[k] and cache[k] == v:
                tokens.append(("cache", k))
                i += 1
                continue
            cache[k] = v
            cache_valid[k] = True
        tokens.append(("lit", int(v)))
        i += 1

    # frequencies
    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}
    for kind, payload in tokens:
        if kind == "lit":
            a, r, g, b = _chan(payload)
            gf[g] = gf.get(g, 0) + 1
            rf[r] = rf.get(r, 0) + 1
            bf[b] = bf.get(b, 0) + 1
            af[a] = af.get(a, 0) + 1
        elif kind == "run":
            code, _, _ = _prefix_encode(payload)
            gf[_NUM_LITERALS + code] = gf.get(_NUM_LITERALS + code, 0) + 1
            dcode, _, _ = _prefix_encode(1 + 120)  # distance 1, direct coding
            df[dcode] = df.get(dcode, 0) + 1
        else:
            sym = _NUM_LITERALS + _NUM_LENGTH_CODES + payload
            gf[sym] = gf.get(sym, 0) + 1
    for f in (rf, bf, af, df):
        if not f:
            f[0] = 1  # unused tree still needs one symbol

    if cache_bits:
        bw.write_bit(1)
        bw.write(cache_bits, 4)
    else:
        bw.write_bit(0)
    if write_meta_bit:
        bw.write_bit(0)  # no meta prefix groups

    green_alpha = _NUM_LITERALS + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    green_t = _write_code(bw, _huffman_lengths(gf), green_alpha)
    red_t = _write_code(bw, _huffman_lengths(rf), _NUM_LITERALS)
    blue_t = _write_code(bw, _huffman_lengths(bf), _NUM_LITERALS)
    alpha_t = _write_code(bw, _huffman_lengths(af), _NUM_LITERALS)
    dist_t = _write_code(bw, _huffman_lengths(df), _NUM_DISTANCE_CODES)

    for kind, payload in tokens:
        if kind == "lit":
            a, r, g, b = _chan(payload)
            green_t.encode(bw, g)
            red_t.encode(bw, r)
            blue_t.encode(bw, b)
            alpha_t.encode(bw, a)
        elif kind == "run":
            code, nb, ev = _prefix_encode(payload)
            green_t.encode(bw, _NUM_LITERALS + code)
            bw.write(ev, nb)
            dcode, dnb, dev = _prefix_encode(121)
            dist_t.encode(bw, dcode)
            bw.write(dev, dnb)
        else:
            green_t.encode(bw, _NUM_LITERALS + _NUM_LENGTH_CODES + payload)


def encode_webp(
    img: np.ndarray,
    subtract_green: bool = True,
    cache_bits: int = 0,
    use_rle: bool = True,
) -> bytes:
    """(h, w) / (h, w, 1|3|4) uint8 -> lossless WebP (VP8L) bytes."""
    if img.dtype != np.uint8:
        raise ValueError("image must be uint8")
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in (1, 3, 4):
        raise ValueError("image must be (h, w[, 1|3|4]) uint8")
    h, w, c = img.shape
    if h == 0 or w == 0 or h > 16384 or w > 16384:
        raise ValueError("image dimensions must be in 1..16384")
    if c == 1:
        rgba = np.repeat(img, 3, axis=2)
        alpha = np.full((h, w, 1), 255, np.uint8)
        rgba = np.concatenate([rgba, alpha], axis=2)
    elif c == 3:
        alpha = np.full((h, w, 1), 255, np.uint8)
        rgba = np.concatenate([img, alpha], axis=2)
    else:
        rgba = img
    pix = (
        (rgba[:, :, 3].astype(np.uint32) << 24)
        | (rgba[:, :, 0].astype(np.uint32) << 16)
        | (rgba[:, :, 1].astype(np.uint32) << 8)
        | rgba[:, :, 2].astype(np.uint32)
    )

    bw = BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write_bit(1 if (c == 4 and not np.all(rgba[:, :, 3] == 255)) else 0)
    bw.write(0, 3)  # version

    if subtract_green:
        bw.write_bit(1)
        bw.write(2, 2)  # SUBTRACT_GREEN
        g = (pix >> np.uint32(8)) & np.uint32(0xFF)
        r = (((pix >> np.uint32(16)) & np.uint32(0xFF)) - g) & np.uint32(0xFF)
        b = ((pix & np.uint32(0xFF)) - g) & np.uint32(0xFF)
        pix = (
            (pix & np.uint32(0xFF000000)) | (r << np.uint32(16))
            | (g << np.uint32(8)) | b
        )
    bw.write_bit(0)  # end of transforms

    _encode_entropy_image(bw, pix, cache_bits=cache_bits, use_rle=use_rle)

    body = bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
