"""Sketching kernels for near-duplicate detection: shingles, MinHash,
SimHash — numpy-vectorized per batch, deterministic across processes.

Token hashing is a vectorized FNV-1a over the Arrow string buffers
(hash_string_array) — stable across processes/nodes, no Python string
objects.  All per-row reductions use parent-index grouping +
``np.minimum.reduceat`` / ``np.add.reduceat`` — no Python loop over rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from .arrow_util import single_chunk as _single_chunk
import pyarrow.compute as pc

_MERSENNE = np.uint64((1 << 61) - 1)
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)





_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def hash_string_array(arr: pa.Array) -> np.ndarray:
    """Vectorized FNV-1a over an Arrow string array's raw buffers —
    deterministic across processes/nodes, no Python string objects
    (to_pylist + object hashing was 92% of the MinHash sketch cost).
    One vectorized pass per character position over the still-active
    subset (token lengths are small)."""
    n = len(arr)
    if n == 0:
        return np.empty(0, np.uint64)
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], np.int32)[arr.offset : arr.offset + n + 1].astype(
        np.int64
    )
    data = np.frombuffer(bufs[2], np.uint8)
    starts, lens = offs[:-1], offs[1:] - offs[:-1]
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    max_len = int(lens.max())
    with np.errstate(over="ignore"):
        for k in range(max_len):
            active = lens > k
            idx = starts[active] + k
            h[active] = (h[active] ^ data[idx].astype(np.uint64)) * _FNV_PRIME
    return h


def token_hashes(texts: pa.Array) -> tuple[np.ndarray, np.ndarray, int]:
    """-> (uint64 hash per lowercase whitespace token, parent row index,
    n_rows)."""
    toks = pc.utf8_split_whitespace(texts)
    flat = _single_chunk(pc.utf8_lower(pc.list_flatten(toks)))
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    flat, parents = flat.filter(pa.array(nonempty)), parents[nonempty]
    if len(flat) == 0:
        return np.empty(0, np.uint64), parents.astype(np.int64), len(texts)
    return hash_string_array(flat), parents.astype(np.int64), len(texts)


def shingle_hashes(
    texts: pa.Array, n: int = 3
) -> tuple[np.ndarray, np.ndarray, int]:
    """Word ``n``-gram shingle hashes: combine the n consecutive token
    hashes of each row with a polynomial mix.  Rows shorter than ``n``
    tokens contribute a single whole-row shingle so empty-ish docs still
    sketch deterministically.

    -> (uint64 shingle hashes, parent row index per shingle, n_rows)
    """
    h, parents, n_rows = token_hashes(texts)
    if len(h) == 0:
        return h, parents, n_rows
    # Row boundaries in the flat token array (tokens are row-ordered).
    starts = np.r_[0, np.flatnonzero(parents[1:] != parents[:-1]) + 1]
    lengths = np.diff(np.r_[starts, len(parents)])
    out_h, out_p = [], []
    base = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        # Long-enough rows: vectorized sliding windows over the flat array.
        acc = h.copy()
        for k in range(1, n):
            acc = ((acc * base) & _MASK64) ^ np.r_[h[k:], np.zeros(k, np.uint64)]
        # A window starting at flat index i is valid iff i+n-1 is in the
        # same row: i - row_start <= row_len - n.
        row_start_of = np.repeat(starts, lengths)
        row_len_of = np.repeat(lengths, lengths)
        pos = np.arange(len(h)) - row_start_of
        valid = pos <= row_len_of - n
        out_h.append(acc[valid])
        out_p.append(parents[valid])
        # Short rows (< n tokens): one whole-row shingle.
        short = lengths < n
        if short.any():
            sh = np.zeros(short.sum(), np.uint64)
            s_starts, s_lens = starts[short], lengths[short]
            for k in range(int(s_lens.max())):
                live = s_lens > k
                sh[live] = ((sh[live] * base) & _MASK64) ^ h[s_starts[live] + k]
            out_h.append(sh)
            out_p.append(parents[s_starts])
    hh = np.concatenate(out_h)
    pp = np.concatenate(out_p)
    order = np.argsort(pp, kind="stable")
    return hh[order], pp[order], n_rows


def _minhash_params(k: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), size=k, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), size=k, dtype=np.uint64)
    return a, b


def minhash_signatures(
    shingles: np.ndarray, parents: np.ndarray, n_rows: int, k: int = 64
) -> np.ndarray:
    """(n_rows, k) uint64 MinHash signatures via universal hashing
    h_i(x) = (a_i·x + b_i) mod p over the row's shingle set.  Rows with
    no shingles get all-max signatures (match nothing)."""
    a, b = _minhash_params(k)
    sig = np.full((n_rows, k), _MERSENNE, dtype=np.uint64)
    if len(shingles) == 0:
        return sig
    starts = np.r_[0, np.flatnonzero(parents[1:] != parents[:-1]) + 1]
    rows = parents[starts]
    x = shingles & _MERSENNE
    for i in range(k):
        with np.errstate(over="ignore"):
            hv = ((a[i] * x + b[i]) & _MASK64) % _MERSENNE
        sig[rows, i] = np.minimum.reduceat(hv, starts)
    return sig


def lsh_band_keys(sig: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """(n_rows, bands) int64 band keys: mix each band's signature slice
    into one 64-bit key (deterministic arithmetic mix)."""
    n, k = sig.shape
    assert bands * rows_per_band <= k
    keys = np.zeros((n, bands), dtype=np.uint64)
    base = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        for b_i in range(bands):
            acc = np.full(n, np.uint64(b_i + 1), dtype=np.uint64)
            for r in range(rows_per_band):
                v = sig[:, b_i * rows_per_band + r]
                acc = ((acc ^ v) * base) & _MASK64
            keys[:, b_i] = acc
    return keys.astype(np.int64)


def signature_jaccard(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Estimated Jaccard from MinHash signatures: fraction of equal
    components. a: (n, k), b: (n, k) -> (n,)."""
    return (a == b).mean(axis=1)


def simhash(texts: pa.Array, bits: int = 64) -> np.ndarray:
    """64-bit SimHash over whitespace tokens (unit weights): sum ±1 per
    bit of each token hash, take the sign.  -> (n_rows,) uint64."""
    h, parents, n_rows = token_hashes(texts)
    return simhash_from_tokens(h, parents, n_rows, bits)


def simhash_from_tokens(
    h: np.ndarray, parents: np.ndarray, n_rows: int, bits: int = 64
) -> np.ndarray:
    """SimHash from precomputed token hashes (lets callers that also
    need the token stream — e.g. presence masks — tokenize ONCE)."""
    out = np.zeros(n_rows, dtype=np.uint64)
    if len(h) == 0:
        return out
    # (n_flat, 64) bit matrix -> ±1 contributions, reduced per row with
    # a single axis-0 reduceat over the parent-run boundaries (tokens
    # arrive parent-ordered; np.add.at is unbuffered and ~10x slower).
    bit_cols = ((h[:, None] >> np.arange(bits, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int16
    )
    contrib = 2 * bit_cols - 1
    starts = np.r_[0, np.flatnonzero(parents[1:] != parents[:-1]) + 1]
    sums = np.add.reduceat(contrib, starts, axis=0)
    rows_present = parents[starts]
    full = np.zeros((n_rows, bits), dtype=np.int32)
    full[rows_present] = sums
    bits_set = (full > 0).astype(np.uint64)
    out = (bits_set << np.arange(bits, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return out


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Popcount of XOR for uint64 arrays (vectorized via uint8 view)."""
    x = (a ^ b).view(np.uint8) if a.dtype == np.uint64 else (a ^ b).astype(np.uint64).view(np.uint8)
    return np.unpackbits(x.reshape(len(a), 8), axis=1).sum(axis=1)


def simhash_blocks(sig: np.ndarray, n_blocks: int = 4) -> np.ndarray:
    """Split each 64-bit SimHash into ``n_blocks`` equal bit-blocks
    (pigeonhole blocking: two signatures within hamming distance
    ``n_blocks - 1`` share at least one identical block)."""
    width = 64 // n_blocks
    mask = np.uint64((1 << width) - 1)
    cols = [
        ((sig >> np.uint64(i * width)) & mask).astype(np.int64) for i in range(n_blocks)
    ]
    return np.stack(cols, axis=1)


def ngram_hash_positions(
    texts: pa.Array, n: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Position-aware token n-gram hashes: every length-``n`` token
    window of every row, with its 0-based start TOKEN position —
    the instance stream exact-substring dedup ranks.  Unlike
    :func:`shingle_hashes` there is NO whole-row shingle for short
    rows (a row with < n tokens has no n-window, full stop).

    -> (uint64 window hashes, parent row index per window, 0-based
    token start position per window, n_rows).  Hash chain is the same
    FNV fold as shingle_hashes (acc = (acc * base) ^ next), so DuckDB
    oracles recompute it with the identical HUGEINT expression."""
    h, parents, n_rows = token_hashes(texts)
    if len(h) == 0:
        return (
            np.empty(0, np.uint64),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            n_rows,
        )
    starts = np.r_[0, np.flatnonzero(parents[1:] != parents[:-1]) + 1]
    lengths = np.diff(np.r_[starts, len(parents)])
    base = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        acc = h.copy()
        for k in range(1, n):
            acc = ((acc * base) & _MASK64) ^ np.r_[h[k:], np.zeros(k, np.uint64)]
    row_start_of = np.repeat(starts, lengths)
    row_len_of = np.repeat(lengths, lengths)
    pos = np.arange(len(h)) - row_start_of
    valid = pos <= row_len_of - n
    return acc[valid], parents[valid], pos[valid], n_rows
