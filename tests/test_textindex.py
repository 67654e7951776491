"""Inverted text index: postings correctness, bucket pruning, chunked
cell files, end-to-end search ranking."""

import collections
import glob
import json
import os
import zlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from tesseract_wasm_ray.pipelines.textindex import (
    build_text_index,
    doc_term_freqs,
    search_text_index,
    term_bucket,
)

DOCS = [
    ("d1", "the quick brown fox the FOX"),
    ("d2", "the lazy dog"),
    ("d3", "fox fox fox shuffle"),
    ("d4", ""),
    ("d5", "Shuffle JOIN shuffle join"),
]


def _table():
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in DOCS]),
            "text": pa.array([t for _, t in DOCS]),
        }
    )


def test_doc_term_freqs_matches_naive():
    out = doc_term_freqs(_table())
    got = {
        (t, d): c
        for t, d, c in zip(
            out.column("term").to_pylist(),
            out.column("doc_id").to_pylist(),
            out.column("tf").to_pylist(),
        )
    }
    want: dict = collections.Counter()
    for d, text in DOCS:
        for tok in text.lower().split():
            want[(tok, d)] += 1
    assert got == dict(want)


def test_term_bucket_stable_and_bounded():
    terms = pa.array(["fox", "the", "fox", "shuffle"])
    b = term_bucket(terms, 8)
    assert b[0] == b[2] == zlib.crc32(b"fox") % 8
    assert ((b >= 0) & (b < 8)).all()


def test_build_and_search(tmp_path, ray_session):
    ds = rd.from_arrow(_table())
    idx = str(tmp_path / "idx")
    manifest = build_text_index(ds, idx, num_buckets=8)
    assert manifest["num_buckets"] == 8
    assert os.path.exists(os.path.join(idx, "buckets.json"))
    # tf totals: fox -> d3:3, d1:2; shuffle -> d3:1, d5:2
    out = search_text_index(idx, ["fox", "shuffle"], k=10).to_pandas()
    got = list(zip(out["doc_id"], out["score"]))
    assert got == [("d3", 4), ("d1", 2), ("d5", 2)]  # tie d1/d5 -> id asc


def test_search_reads_only_query_buckets(tmp_path, ray_session):
    """Storage pruning: a search only lists files under the buckets its
    terms hash to."""
    ds = rd.from_arrow(_table())
    idx = str(tmp_path / "idx")
    build_text_index(ds, idx, num_buckets=8)
    fox_bucket = zlib.crc32(b"fox") % 8
    other = [
        d
        for d in glob.glob(os.path.join(idx, "bucket=*"))
        if d != os.path.join(idx, f"bucket={fox_bucket:04d}")
    ]
    # remove every other bucket; a pruned search must not touch them
    import shutil

    for d in other:
        shutil.rmtree(d)
    out = search_text_index(idx, ["fox"], k=10).to_pandas()
    assert list(zip(out["doc_id"], out["score"])) == [("d3", 3), ("d1", 2)]


def test_chunked_bucket_files(tmp_path, ray_session):
    """rows_per_file=1 forces one file per posting row; search result
    is unchanged and the manifest records the file counts."""
    ds = rd.from_arrow(_table())
    idx = str(tmp_path / "idx")
    manifest = build_text_index(ds, idx, num_buckets=2, rows_per_file=1)
    total_files = sum(e["files"] for e in manifest["buckets"])
    total_rows = sum(e["rows"] for e in manifest["buckets"])
    assert total_files == total_rows  # one row per file
    out = search_text_index(idx, ["fox", "shuffle"], k=10).to_pandas()
    assert list(zip(out["doc_id"], out["score"])) == [("d3", 4), ("d1", 2), ("d5", 2)]


def test_rebuild_clears_stale_buckets(tmp_path, ray_session):
    ds = rd.from_arrow(_table())
    idx = str(tmp_path / "idx")
    build_text_index(ds, idx, num_buckets=8)
    build_text_index(ds, idx, num_buckets=2)  # rebuild, fewer buckets
    with open(os.path.join(idx, "buckets.json")) as f:
        manifest = json.load(f)
    assert manifest["num_buckets"] == 2
    dirs = glob.glob(os.path.join(idx, "bucket=*"))
    assert all(
        int(os.path.basename(d).split("=")[1]) < 2 for d in dirs
    ), "stale bucket dirs from the 8-bucket build must be cleared"


def test_doc_term_freqs_inlines_doc_length():
    out = doc_term_freqs(_table())
    dl = dict(zip(out.column("doc_id").to_pylist(), out.column("dl").to_pylist()))
    want = {d: len(t.split()) for d, t in DOCS if t.split()}
    assert dl == want


def test_bm25_search_matches_local_reference(tmp_path, ray_session):
    """Distributed BM25 == a local numpy reference computed straight
    from the corpus (idf, length norm, rounding, tie-break)."""
    import math

    from tesseract_wasm_ray.pipelines.textindex import search_text_index_bm25

    ds = rd.from_arrow(_table()).repartition(3)
    idx = str(tmp_path / "idx")
    manifest = build_text_index(ds, idx, num_buckets=8)
    assert manifest["n_docs"] == 5  # includes the empty doc
    assert manifest["total_len"] == sum(len(t.split()) for _, t in DOCS)

    terms = ["fox", "shuffle"]
    got = search_text_index_bm25(idx, terms, k=10).to_pandas()

    n_docs = 5
    avgdl = manifest["total_len"] / n_docs
    tf: dict = {}
    dl: dict = {}
    for d, text in DOCS:
        toks = text.lower().split()
        dl[d] = len(toks)
        for t in terms:
            c = toks.count(t)
            if c:
                tf[(d, t)] = c
    df = {t: sum(1 for (_, tt) in tf if tt == t) for t in terms}
    scores: dict = {}
    for (d, t), c in tf.items():
        idf = math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
        part = idf * c * (1.2 + 1.0) / (c + 1.2 * ((1.0 - 0.75) + 0.75 * dl[d] / avgdl))
        scores[d] = scores.get(d, 0.0) + part
    want = sorted(
        ((round(s, 4), d) for d, s in scores.items()),
        key=lambda x: (-x[0], x[1]),
    )
    assert list(zip(got["score"], got["doc_id"])) == want
