"""Checkpoint manifest: per-partition lineage + metrics, exact resume.

North-rule requirement (BASELINE.json): each partition emits lineage
records (input files, model version, config fingerprint) plus metrics to
a manifest table; a restarted job anti-joins pending partitions against
the manifest and recomputes only what is missing.

Partition = reassembly bucket (stages/reassemble.py): bucket assignment
is a pure function of doc_id, so "which docs live in bucket k" is stable
across runs and cluster sizes.  Each bucket's output parquet is written
atomically (tmp file + rename) by the stitch task itself; the manifest
row is emitted only after the rename, so a crash can leave at most
orphan tmp files, never a committed-but-absent partition.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import MANIFEST_SCHEMA

MANIFEST_NAME = "manifest.parquet"


def config_fingerprint(cfg: dict) -> str:
    return hashlib.sha256(json.dumps(cfg, sort_keys=True).encode()).hexdigest()[:16]


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST_NAME)


def load_manifest(out_dir: str) -> pa.Table:
    p = manifest_path(out_dir)
    if os.path.exists(p):
        return pq.read_table(p)
    return pa.Table.from_pylist([], schema=MANIFEST_SCHEMA)


def completed_buckets(out_dir: str, fingerprint: str) -> set[int]:
    m = load_manifest(out_dir)
    if m.num_rows == 0:
        return set()
    rows = m.to_pylist()
    return {
        r["partition_id"]
        for r in rows
        if r["config_fingerprint"] == fingerprint
        and os.path.exists(os.path.join(out_dir, r["output_file"]))
    }


def completed_files(out_dir: str, fingerprint: str) -> list[str]:
    """Absolute paths of every completed bucket's output parquet under
    the given config fingerprint (for whole-output reads/validation)."""
    m = load_manifest(out_dir)
    out = []
    for r in m.to_pylist():
        p = os.path.join(out_dir, r["output_file"])
        if r["config_fingerprint"] == fingerprint and os.path.exists(p):
            out.append(p)
    return sorted(set(out))


def append_manifest(out_dir: str, new_rows: list[dict]) -> None:
    """Atomic append: rewrite manifest to a tmp file, rename over."""
    if not new_rows:
        return
    old = load_manifest(out_dir)
    new = pa.Table.from_pylist(new_rows, schema=MANIFEST_SCHEMA)
    merged = pa.concat_tables([old, new]) if old.num_rows else new
    tmp = manifest_path(out_dir) + ".tmp"
    pq.write_table(merged, tmp)
    os.replace(tmp, manifest_path(out_dir))


def write_bucket_atomic(out_dir: str, bucket: int, table: pa.Table) -> str:
    """Write one bucket's output parquet atomically; returns relative name."""
    name = f"part-{bucket:05d}.parquet"
    final = os.path.join(out_dir, name)
    tmp = final + f".tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, final)
    return name


def write_quarantine_atomic(out_dir: str, bucket: int, table: pa.Table) -> str:
    """Dead-letter sink: one quarantine parquet per bucket (atomic, same
    tmp+rename discipline), holding the span rows + error strings of
    documents whose media failed decode/recognition.  Returns the
    relative name recorded in the manifest's ``quarantine_file``."""
    qdir = os.path.join(out_dir, "quarantine")
    os.makedirs(qdir, exist_ok=True)
    name = f"quarantine/part-{bucket:05d}.parquet"
    final = os.path.join(out_dir, name)
    tmp = final + f".tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, final)
    return name
