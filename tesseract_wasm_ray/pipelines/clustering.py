"""Distributed k-means clustering + SemDeDup semantic dedup.

The LLM-training-data op the dedup suite still lacked: cluster the
embedding table, then drop within-cluster semantic near-duplicates
(Abbas et al. 2023, "SemDeDup" — public arXiv:2303.09540).

Exactness design: k-means is normally impossible to gate bit-for-bit
across engines because float mean/distance summation order differs.
This implementation quantizes embeddings to integers once
(``floor(v * scale + 0.5)`` in float64 — identical IEEE ops in numpy
and DuckDB) and keeps every piece of Lloyd state integral:

- centroid  = element-wise TRUNCATED integer division sum // count
  (DuckDB ``//`` truncates toward zero; :func:`_trunc_div` mirrors it),
- assignment = argmin of the exact int64 squared distance with a
  min-cluster-id tie-break (numpy ``argmin`` first-hit == SQL
  ``ORDER BY dist, cid``),
- seeds = the k rows with the smallest ``md5(vec_id::VARCHAR)``.

Integer sums commute, so block layout / parallelism / reduce order
cannot perturb a single bit: the DuckDB oracle re-runs the whole Lloyd
chain in SQL and the gate is exact, not tolerance-based.

Scale shape (100 TB): each Lloyd iteration is one streaming
``map_batches`` pass emitting <= k tiny (cluster, count, sum-vector)
partial rows per block; the driver folds only O(blocks x k x dim)
integers — the embedding corpus itself never leaves the workers and
never shuffles.  Only SemDeDup's per-cluster verify co-locates vectors
(a ``groupby(cluster)`` — inherent to the algorithm; pick k ~ sqrt(n)
so clusters stay small, as the paper does).

Reference scope note: the reference engine (robertknight/tesseract-wasm)
has no clustering surface; this module belongs to the training-data
operator suite the driver brief adds on top.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.arrow_util import single_chunk as _single_chunk
from .similarity import _matrix, _unit

__all__ = ["kmeans_fit", "kmeans_assign", "kmeans_clusters", "semdedup"]


def _trunc_div(s: np.ndarray, n: int) -> np.ndarray:
    """Integer division truncating toward zero (== DuckDB ``//`` on
    BIGINT).  numpy's ``//`` floors, which differs on negative sums."""
    q = s // n
    q[(s % n != 0) & (s < 0)] += 1
    return q


def _quantize(batch: pa.Table, emb_col: str, scale: int) -> np.ndarray:
    """float list column -> exact int64 matrix via float64
    ``floor(v*scale + 0.5)`` — bit-identical to the SQL oracle's
    ``floor(v::DOUBLE * scale + 0.5)::BIGINT``."""
    m = _matrix(batch, emb_col)
    if m.size == 0:
        return m.astype(np.int64)
    return np.floor(m * float(scale) + 0.5).astype(np.int64)


def _pack_rows(mat: np.ndarray) -> pa.ListArray:
    """(n, d) int64 -> list<int64> rows (plain ListArray so empty and
    non-empty blocks carry the identical Arrow type)."""
    n, d = mat.shape if mat.size else (0, 0)
    offsets = pa.array(np.arange(0, (n + 1) * d, max(d, 1), dtype=np.int32)[: n + 1])
    if n == 0:
        return pa.array([], pa.list_(pa.int64()))
    return pa.ListArray.from_arrays(offsets, pa.array(mat.ravel(), pa.int64()))


def _unpack_rows(col: pa.Array | pa.ChunkedArray, dim: int) -> np.ndarray:
    """list<int64> rows -> (n, dim) int64 (offset-safe via flatten)."""
    arr = _single_chunk(col)
    return arr.flatten().to_numpy(zero_copy_only=False).reshape(-1, dim)


def _assign_int(q: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Exact argmin_j ||x - c_j||^2 over int64 rows; ties -> smallest
    cluster id (numpy argmin returns the first minimum)."""
    # ||x||^2 is constant per row -> drop it from the argmin.
    scores = q @ cent.T  # int64-exact (numpy integer matmul)
    cnorm = np.einsum("ij,ij->i", cent, cent)
    return np.argmin(cnorm[None, :] - 2 * scores, axis=1)


def _seed_centroids(ds_q: rd.Dataset, k: int, id_col: str) -> np.ndarray:
    """The k rows with the smallest md5 of the id's decimal string
    (== SQL ``ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT k``).  Each
    block emits its local k smallest (the global min-k is a subset of
    the union), so the driver folds at most blocks x k tiny rows."""

    def local_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "__h": pa.array([], pa.string()),
                    id_col: pa.array([], b.column(id_col).type),
                    "__q": pa.array([], pa.list_(pa.int64())),
                }
            )
        # vectorized digest (functions/fastmd5.py) — same md5-of-decimal
        # seed key, no per-row Python on this map path.
        from ..functions.fastmd5 import md5_hex

        hx = np.asarray(md5_hex(b.column(id_col)).to_pylist())
        order = np.argsort(hx, kind="stable")[:k]
        idx = pa.array(order, pa.int64())
        return pa.table(
            {
                "__h": pa.array(hx[order]),
                id_col: _single_chunk(b.column(id_col)).take(idx),
                "__q": _single_chunk(b.column("__q")).take(idx),
            }
        )

    parts = [
        t
        for t in ds_q.map_batches(local_topk, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        if t.num_rows
    ]
    merged = pa.concat_tables(parts).combine_chunks()
    hx = merged.column("__h").to_numpy(zero_copy_only=False)
    ids = merged.column(id_col).to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, hx))[:k]
    qcol = _single_chunk(merged.column("__q"))
    dim = len(qcol[0])
    return _unpack_rows(qcol, dim)[order]


def _quantized_view(
    ds: rd.Dataset, emb_col: str, id_col: str, scale: int
) -> rd.Dataset:
    def quantize(b: pa.Table) -> pa.Table:
        return pa.table(
            {id_col: b.column(id_col), "__q": _pack_rows(_quantize(b, emb_col, scale))}
        )

    return ds.map_batches(quantize, batch_format="pyarrow")


def kmeans_fit(
    ds: rd.Dataset,
    k: int = 8,
    iters: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1000,
    cache: bool = False,
    cache_cap_bytes: int = 256 << 20,
) -> np.ndarray:
    """Distributed Lloyd's over the full dataset -> (k, dim) int64
    centroids.  ``iters`` streaming passes; every pass ships the
    centroid matrix ONCE via ``ray.put`` and reduces tiny integer
    partials on the driver (order-insensitive: integer adds commute).
    Empty clusters keep their previous centroid (oracle mirrors).

    ``cache=True`` materializes the quantized (id, q) view once so the
    per-iteration passes skip the re-read + re-quantize — right when
    the quantized table fits the object store (it is ~2x the float32
    input).  The request is CAPPED at ``cache_cap_bytes`` (the
    lookup_join_auto discipline): a corpus whose estimated quantized
    size exceeds the cap silently falls back to streaming re-reads per
    pass, so an over-eager ``cache=True`` cannot pin a 100 TB corpus in
    the object store.  Results are identical either way — caching only
    changes where the quantized blocks live between passes."""
    ds_q = _quantized_view(ds, emb_col, id_col, scale)
    if cache:
        # quantized int64 view is ~2x the float32 source bytes;
        # size_bytes() is metadata-cheap for parquet-backed inputs
        est_q = 2 * (ds.size_bytes() or 0)
        if est_q <= cache_cap_bytes:
            ds_q = ds_q.materialize()
    cent = _seed_centroids(ds_q, k, id_col)
    k_eff, dim = cent.shape

    partial_schema = pa.schema(
        [("__cluster", pa.int32()), ("__n", pa.int64()), ("__s", pa.list_(pa.int64()))]
    )

    for _ in range(iters):
        cent_ref = ray.put(cent)

        def partial(b: pa.Table, _ref=cent_ref) -> pa.Table:
            if b.num_rows == 0:
                return partial_schema.empty_table()
            q = _unpack_rows(b.column("__q"), dim)
            a = _assign_int(q, ray.get(_ref))
            counts = np.bincount(a, minlength=k_eff)
            s = np.zeros((k_eff, dim), np.int64)
            np.add.at(s, a, q)
            present = np.flatnonzero(counts)
            return pa.table(
                {
                    "__cluster": pa.array(present.astype(np.int32)),
                    "__n": pa.array(counts[present].astype(np.int64)),
                    "__s": _pack_rows(s[present]),
                }
            )

        sums = np.zeros((k_eff, dim), np.int64)
        counts = np.zeros(k_eff, np.int64)
        for t in ds_q.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            if t.num_rows == 0:
                continue
            # np.add.at, NOT fancy-index +=: iter_batches coalesces many
            # blocks' partials into one batch, so a cluster id repeats
            # within `cl` and += would keep only the last occurrence.
            cl = t.column("__cluster").to_numpy(zero_copy_only=False)
            np.add.at(counts, cl, t.column("__n").to_numpy(zero_copy_only=False))
            np.add.at(sums, cl, _unpack_rows(t.column("__s"), dim))
        new_cent = cent.copy()  # empty clusters keep their old centroid
        for c in np.flatnonzero(counts > 0):
            new_cent[c] = _trunc_div(sums[c], int(counts[c]))
        cent = new_cent
    return cent


def kmeans_assign(
    ds: rd.Dataset,
    centroids: np.ndarray,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1000,
    keep_cols: tuple[str, ...] = (),
) -> rd.Dataset:
    """One streaming pass: (id_col, cluster:int32 [, keep_cols])."""
    cent_ref = ray.put(np.asarray(centroids, np.int64))

    def assign(b: pa.Table) -> pa.Table:
        cluster = (
            _assign_int(_quantize(b, emb_col, scale), ray.get(cent_ref)).astype(
                np.int32
            )
            if b.num_rows
            else np.array([], np.int32)
        )
        cols: dict = {id_col: b.column(id_col), "cluster": pa.array(cluster)}
        for c in keep_cols:
            cols[c] = b.column(c)
        return pa.table(cols)

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans_clusters(
    ds: rd.Dataset,
    k: int = 8,
    iters: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1000,
    cache: bool = False,
) -> rd.Dataset:
    """Fit + assign -> (id_col, cluster) for every row."""
    cent = kmeans_fit(ds, k, iters, emb_col, id_col, scale, cache=cache)
    return kmeans_assign(ds, cent, emb_col, id_col, scale)


def semdedup(
    ds: rd.Dataset,
    k: int = 8,
    iters: int = 4,
    threshold: float = 0.98,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1000,
    chunk: int = 1024,
    cache: bool = False,
) -> rd.Dataset:
    """SemDeDup: k-means cluster, then within each cluster drop every
    row with a SMALLER-id member at cosine >= threshold (EXISTS
    semantics, same as embedding_neardup — the survivor set is
    deterministic).  Returns the surviving (id_col) rows.

    The per-cluster verify is the only stage that co-locates vectors
    (groupby cluster -> chunked float64 gram against the sorted-by-id
    prefix); cluster size is bounded by k — choose k ~ sqrt(n) at
    scale.  Cosine is float; the gate relies on threshold margin
    (planted copies ~1.0 vs natural pairs <= ~0.51), exactly like the
    green embedding_neardup oracle."""
    cent = kmeans_fit(ds, k, iters, emb_col, id_col, scale, cache=cache)
    assigned = kmeans_assign(ds, cent, emb_col, id_col, scale, keep_cols=(emb_col,))

    def cluster_dedup(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        u = _unit(_matrix(g, emb_col))[order]
        ids_sorted = ids[order]
        n = len(ids_sorted)
        removed = np.zeros(n, bool)
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            gram = u[s:e] @ u[:e].T  # (chunk, e)
            jmask = np.arange(e)[None, :] < np.arange(s, e)[:, None]
            removed[s:e] = ((gram >= threshold) & jmask).any(axis=1)
        return pa.table({id_col: pa.array(ids_sorted[~removed])})

    return assigned.groupby("cluster").map_groups(cluster_dedup, batch_format="pyarrow")
