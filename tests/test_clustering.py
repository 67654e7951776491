"""Integer k-means + SemDeDup (pipelines/clustering.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tesseract_wasm_ray.pipelines.clustering import (
    _assign_int,
    _trunc_div,
    kmeans_clusters,
    kmeans_fit,
    semdedup,
)


def test_trunc_div_matches_sql_semantics():
    """DuckDB ``//`` truncates toward zero; verify against duckdb on a
    sign/remainder sweep so the centroid update can never diverge."""
    import duckdb

    s = np.array([-7, -6, -1, 0, 1, 6, 7, -100001, 100001], np.int64)
    got = _trunc_div(s.copy(), 3)
    want = np.array(
        duckdb.sql(
            "SELECT list_transform([-7,-6,-1,0,1,6,7,-100001,100001]::BIGINT[],"
            " v -> v // 3)"
        ).fetchone()[0]
    )
    assert np.array_equal(got, want)


def test_assign_tie_break_prefers_min_cluster_id():
    """A point exactly equidistant from two centroids must take the
    smaller cluster id (numpy first-min == SQL ORDER BY dist, cid)."""
    cent = np.array([[0, 0], [2, 0]], np.int64)
    q = np.array([[1, 0]], np.int64)  # dist 1 to both
    assert _assign_int(q, cent)[0] == 0


def _toy_dataset(n=300, dim=8, blocks=1):
    import ray.data as rd

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(3, dim))
    m = (centers[np.arange(n) % 3] + 0.05 * rng.normal(size=(n, dim))).astype(
        np.float32
    )
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.ravel(), pa.float32()), dim
            ),
        }
    )
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_kmeans_fit_invariant_to_partitioning(ray_session):
    """Integer partial sums commute: 1 block and 8 blocks must yield
    bit-identical centroids (the property float k-means cannot have)."""
    c1 = kmeans_fit(_toy_dataset(blocks=1), k=4, iters=3)
    c8 = kmeans_fit(_toy_dataset(blocks=8), k=4, iters=3)
    assert np.array_equal(c1, c8)


def test_kmeans_cache_cap_falls_back_to_streaming(ray_session):
    """cache=True above the byte cap must NOT materialize the quantized
    view (the 100 TB guard) and still produce bit-identical centroids;
    under the cap the cached run matches too."""
    base = kmeans_fit(_toy_dataset(blocks=4), k=4, iters=3, cache=False)
    capped = kmeans_fit(
        _toy_dataset(blocks=4), k=4, iters=3, cache=True, cache_cap_bytes=1
    )
    cached = kmeans_fit(_toy_dataset(blocks=4), k=4, iters=3, cache=True)
    assert np.array_equal(base, capped)
    assert np.array_equal(base, cached)


def test_kmeans_clusters_assigns_every_row(ray_session):
    out = kmeans_clusters(_toy_dataset(blocks=4), k=4, iters=2).to_pandas()
    assert len(out) == 300
    assert out["cluster"].between(0, 3).all()
    # 3 planted blobs, k=4: the 3 true clusters must be separated.
    assert out["cluster"].nunique() >= 3


def test_semdedup_removes_planted_exact_copies(ray_session):
    """Exact copies quantize identically -> same cluster -> cosine 1 ->
    the higher-id copy is dropped; base rows all survive."""
    import ray.data as rd

    base = _toy_dataset(n=120)
    t = base.to_pandas()
    copies = t.iloc[:20].copy()
    copies["vec_id"] = copies["vec_id"] + 10_000
    both = pa.table(
        {
            "vec_id": pa.array(
                np.concatenate([t["vec_id"].to_numpy(), copies["vec_id"].to_numpy()]),
                pa.int64(),
            ),
            "embedding": pa.array(
                list(t["embedding"]) + list(copies["embedding"]),
                pa.list_(pa.float32()),
            ),
        }
    )
    ds = rd.from_arrow(both).repartition(5)
    kept = set(
        semdedup(ds, k=4, iters=2, threshold=0.98).to_pandas()["vec_id"].tolist()
    )
    assert all(10_000 + i not in kept for i in range(20)), "copies must drop"

    # Distributed result == local brute-force reference of the same
    # rule (cluster via the same exact integer k-means, then EXISTS
    # lower-id cosine >= threshold within cluster).
    ids = both.column("vec_id").to_numpy()
    flat = both.column("embedding").combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    )
    m = flat.astype(np.float64).reshape(len(ids), -1)
    q = np.floor(m * 1000.0 + 0.5).astype(np.int64)
    cent = kmeans_fit(ds, k=4, iters=2)
    a = _assign_int(q, cent)
    u = m / np.maximum(np.linalg.norm(m, axis=1), 1e-12)[:, None]
    order = np.argsort(ids, kind="stable")
    want = set()
    for c in range(4):
        rows = order[a[order] == c]
        gram = u[rows] @ u[rows].T
        low = np.tril(gram >= 0.98, k=-1)
        want.update(ids[rows[~low.any(axis=1)]].tolist())
    assert kept == want
