"""Similarity search: brute-force exactness vs numpy oracle, IVF recall,
kNN self-join sanity."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(31)
    mat = rng.standard_normal((300, 24)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(300)]
    return rd.from_arrow(pa.Table.from_pylist(rows)), mat


def _oracle_topk(mat, q, k):
    u = mat.astype(np.float64)
    u = u / np.linalg.norm(u, axis=1)[:, None]
    qn = q / np.linalg.norm(q)
    cos = u @ qn
    order = np.lexsort((np.arange(len(cos)), -cos))
    return order[:k], cos[order[:k]]


def test_topk_cosine_matches_numpy_oracle(emb_ds):
    from tesseract_wasm_ray.pipelines.similarity import topk_cosine

    ds, mat = emb_ds
    q = mat[7].astype(np.float64)
    got = topk_cosine(ds, q, k=10).to_pandas()
    ids, scores = _oracle_topk(mat, q, 10)
    assert got["vec_id"].tolist() == ids.tolist()
    np.testing.assert_allclose(got["cos_sim"].to_numpy(), scores, atol=1e-9)


def test_ivf_topk_recall(emb_ds):
    from tesseract_wasm_ray.pipelines.similarity import ivf_topk

    ds, mat = emb_ds
    q = mat[3].astype(np.float64)
    got = set(ivf_topk(ds, q, k=10, n_centroids=8, nprobe=4).to_pandas()["vec_id"])
    exact, _ = _oracle_topk(mat, q, 10)
    recall = len(got & set(exact.tolist())) / 10
    assert recall >= 0.5  # approximate path; brute force is the baseline
    assert 3 in got  # the query's own vector is always found


def test_knn_self_join(emb_ds):
    from tesseract_wasm_ray.pipelines.similarity import knn_self_join

    ds, mat = emb_ds
    out = knn_self_join(ds, k=3).to_pandas()
    assert len(out) == 300 * 3
    assert (out["vec_id"] != out["neighbor_id"]).all()
    # Spot-check one row against the numpy oracle.
    row0 = out[out["vec_id"] == 0].sort_values("cos_sim", ascending=False)
    ids, _ = _oracle_topk(mat, mat[0].astype(np.float64), 4)
    assert row0["neighbor_id"].tolist() == [i for i in ids.tolist() if i != 0][:3]


def test_ivf_index_on_disk(emb_ds, tmp_path):
    """build_ivf_index + ivf_index_topk: storage-pruned search; with
    nprobe == n_centroids it must equal the brute-force result."""
    from tesseract_wasm_ray.pipelines.similarity import (
        build_ivf_index,
        ivf_index_topk,
    )

    ds, mat = emb_ds
    idx = str(tmp_path / "ivf")
    build_ivf_index(ds, idx, n_centroids=6)
    q = mat[11].astype(np.float64)
    exact_ids, _ = _oracle_topk(mat, q, 10)
    full = ivf_index_topk(idx, q, k=10, nprobe=6).to_pandas()
    assert full["vec_id"].tolist() == exact_ids.tolist()  # all cells = exact
    pruned = set(ivf_index_topk(idx, q, k=10, nprobe=2).to_pandas()["vec_id"])
    assert len(pruned & set(exact_ids.tolist())) >= 5  # pruned recall
    import os
    assert os.path.exists(os.path.join(idx, "centroids.npy"))


def test_ivf_index_multi_block_cells_and_rebuild(emb_ds, tmp_path):
    """Hot cells split into rows_per_file chunks (no one-giant-file
    cell); search result identical to the single-file build; a rebuild
    into the same dir clears stale cell dirs so the manifest and the
    files on disk always agree."""
    import glob
    import json
    import os

    from tesseract_wasm_ray.pipelines.similarity import (
        build_ivf_index,
        ivf_index_topk,
    )

    ds, mat = emb_ds
    idx = str(tmp_path / "ivf")
    build_ivf_index(ds, idx, n_centroids=4, rows_per_file=16)
    files = glob.glob(os.path.join(idx, "cell=*", "*.parquet"))
    cells = {os.path.dirname(f) for f in files}
    assert len(files) > len(cells)  # at least one cell has multiple blocks
    manifest = json.load(open(os.path.join(idx, "cells.json")))
    assert sum(c["rows"] for c in manifest) == 300
    assert sum(c["files"] for c in manifest) == len(files)

    q = mat[11].astype(np.float64)
    exact_ids, _ = _oracle_topk(mat, q, 10)
    full = ivf_index_topk(idx, q, k=10, nprobe=4).to_pandas()
    assert full["vec_id"].tolist() == exact_ids.tolist()

    # Rebuild with more centroids: no stale cell=* dirs may survive.
    build_ivf_index(ds, idx, n_centroids=2, rows_per_file=1024)
    dirs = glob.glob(os.path.join(idx, "cell=*"))
    assert len(dirs) <= 2
    full2 = ivf_index_topk(idx, q, k=10, nprobe=2).to_pandas()
    assert full2["vec_id"].tolist() == exact_ids.tolist()


def test_knn_cells_exact_with_full_probe(emb_ds):
    """Distributed IVF-cell kNN with nprobe == n_centroids must equal
    the exact broadcast result row for row (no broadcast, no driver
    index materialization)."""
    from tesseract_wasm_ray.pipelines.similarity import (
        knn_self_join,
        knn_self_join_cells,
    )

    ds, _ = emb_ds
    exact = (
        knn_self_join(ds, k=3, strategy="broadcast")
        .to_pandas()
        .sort_values(["vec_id", "cos_sim", "neighbor_id"],
                     ascending=[True, False, True], ignore_index=True)
    )
    cells = (
        knn_self_join_cells(ds, k=3, n_centroids=8, nprobe=8)
        .to_pandas()
        .sort_values(["vec_id", "cos_sim", "neighbor_id"],
                     ascending=[True, False, True], ignore_index=True)
    )
    assert exact["vec_id"].tolist() == cells["vec_id"].tolist()
    assert exact["neighbor_id"].tolist() == cells["neighbor_id"].tolist()
    np.testing.assert_allclose(
        exact["cos_sim"].to_numpy(), cells["cos_sim"].to_numpy(), atol=1e-12
    )


def test_knn_cells_pruned_recall(emb_ds):
    """nprobe < n_centroids prunes work; neighbor-set recall vs the
    exact join must stay high on this well-spread corpus."""
    from tesseract_wasm_ray.pipelines.similarity import (
        knn_self_join,
        knn_self_join_cells,
    )

    ds, _ = emb_ds
    exact = knn_self_join(ds, k=3, strategy="broadcast").to_pandas()
    pruned = knn_self_join_cells(ds, k=3, n_centroids=8, nprobe=4).to_pandas()
    want = set(map(tuple, exact[["vec_id", "neighbor_id"]].to_numpy()))
    got = set(map(tuple, pruned[["vec_id", "neighbor_id"]].to_numpy()))
    assert len(got & want) / len(want) >= 0.7


def test_knn_cells_f32_payload_bitwise_equals_f64(emb_ds):
    """The default f32 cell-shuffle payload ships RAW float32
    components and normalizes inside the cell task — for float32-origin
    embeddings that is bit-identical to the f64 payload at half the
    shuffle bytes (VERDICT r03 item 3)."""
    from tesseract_wasm_ray.pipelines.similarity import knn_self_join_cells

    ds, _ = emb_ds
    key = ["vec_id", "cos_sim", "neighbor_id"]
    a = (
        knn_self_join_cells(ds, k=3, n_centroids=8, nprobe=8, payload="f64")
        .to_pandas().sort_values(key, ignore_index=True)
    )
    b = (
        knn_self_join_cells(ds, k=3, n_centroids=8, nprobe=8, payload="f32")
        .to_pandas().sort_values(key, ignore_index=True)
    )
    assert a["neighbor_id"].tolist() == b["neighbor_id"].tolist()
    assert (a["cos_sim"].to_numpy() == b["cos_sim"].to_numpy()).all()  # bitwise


def test_knn_cells_q8_payload_high_recall(emb_ds):
    """q8 payload (int8 codes + scale, 8x smaller than f64): scores are
    approximate, so the contract is high neighbor recall + bounded
    cosine error, not bit equality."""
    from tesseract_wasm_ray.pipelines.similarity import (
        knn_self_join,
        knn_self_join_cells,
    )

    ds, _ = emb_ds
    exact = knn_self_join(ds, k=3, strategy="broadcast").to_pandas()
    q8 = knn_self_join_cells(
        ds, k=3, n_centroids=8, nprobe=8, payload="q8"
    ).to_pandas()
    want = set(map(tuple, exact[["vec_id", "neighbor_id"]].to_numpy()))
    got = set(map(tuple, q8[["vec_id", "neighbor_id"]].to_numpy()))
    assert len(got & want) / len(want) >= 0.9
    # approximate scores stay within quantization error of true cosine
    e = exact.set_index(["vec_id", "neighbor_id"])["cos_sim"]
    pairs = q8.set_index(["vec_id", "neighbor_id"])["cos_sim"]
    common = pairs.index.intersection(e.index)
    assert (pairs.loc[common] - e.loc[common]).abs().max() < 2e-2


def test_knn_cells_bad_payload_rejected(emb_ds):
    from tesseract_wasm_ray.pipelines.similarity import knn_self_join_cells

    ds, _ = emb_ds
    with pytest.raises(ValueError, match="payload"):
        knn_self_join_cells(ds, payload="f16")


def test_knn_auto_switches_to_cells(emb_ds):
    """auto strategy must route large inputs to the cells path instead
    of raising the broadcast guard."""
    from tesseract_wasm_ray.pipelines.similarity import knn_self_join

    ds, _ = emb_ds
    out = knn_self_join(
        ds, k=2, max_rows_broadcast=50, n_centroids=4, nprobe=4
    ).to_pandas()
    # 300 rows > 50 -> cells path; full probe -> complete result.
    assert len(out) == 300 * 2


def test_quantize_q8_rule():
    from tesseract_wasm_ray.pipelines.similarity import quantize_q8

    m = np.array([[0.5, -1.0, 0.25], [0.0, 0.0, 0.0]], dtype=np.float32)
    q, s = quantize_q8(m)
    # scale = 1.0 -> floor(x*127 + 0.5)
    assert q[0].tolist() == [64, -127, 32]
    assert s[0] == 1.0
    # zero vector: scale floored at 1e-30, all-zero codes (no NaN/crash)
    assert q[1].tolist() == [0, 0, 0]


def test_topk_cosine_q8_matches_numpy(emb_ds):
    from tesseract_wasm_ray.pipelines.similarity import quantize_q8, topk_cosine_q8

    ds, mat = emb_ds
    q = mat[7].astype(np.float64)
    got = topk_cosine_q8(ds, q, k=10).to_pandas()
    qd, _ = quantize_q8(mat.astype(np.float64))
    qq = quantize_q8(q.reshape(1, -1))[0][0]
    score = qd @ qq
    order = np.lexsort((np.arange(len(score)), -score))[:10]
    assert got["vec_id"].tolist() == order.tolist()
    assert got["qscore"].tolist() == score[order].tolist()
    # quantized ranking tracks exact cosine closely: top-1 must agree
    exact, _ = _oracle_topk(mat, q, 1)
    assert got["vec_id"].iloc[0] == exact[0]
