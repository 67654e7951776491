"""Small-file compaction for partitioned parquet output.

Long-running pipelines that write resumable, per-bucket parquet (the
engine's flagship discipline — pipelines/extract.py) accumulate many
small files; downstream scans then pay per-file open/metadata cost and
lose row-group pruning leverage.  Compaction rewrites a directory into
files of ~``target_bytes`` each.

Scale shape: planning reads ONLY file-level metadata (name + size —
one os.scandir, no data), bins files into contiguous groups by
first-fit over the SORTED name order (deterministic: same input ->
same plan), and each output file is produced by ONE Ray task that
reads exactly its group and writes exactly one file.  No shuffle, no
driver data movement, resumable at file granularity (an existing
correctly-sized output part is skipped by name).

Reference scope note: the reference engine (robertknight/tesseract-wasm)
has no storage layer; this belongs to the Ray-side ops surface the
driver brief adds (resumable partitioned output).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray


def plan_compaction(
    in_dir: str, target_bytes: int = 128 << 20
) -> list[tuple[str, list[str]]]:
    """Deterministic first-fit binning of ``in_dir``'s parquet files
    (sorted by name) into groups of ~``target_bytes`` of INPUT bytes.
    A file larger than the target gets its own group (never split —
    compaction only merges).  Hive-partitioned layouts are preserved:
    files bin WITHIN their directory and each group carries its
    relative directory, so partition columns encoded in the path
    (``lang=en/...``) survive the rewrite.  Returns
    ``[(rel_dir, [paths...]), ...]``."""
    by_dir: dict[str, list[str]] = {}
    for root, _dirs, names in sorted(os.walk(in_dir)):
        rel = os.path.relpath(root, in_dir)
        pq_files = sorted(
            os.path.join(root, n) for n in names if n.endswith(".parquet")
        )
        if pq_files:
            by_dir["" if rel == "." else rel] = pq_files
    groups: list[tuple[str, list[str]]] = []
    for rel in sorted(by_dir):
        cur: list[str] = []
        cur_bytes = 0
        for f in by_dir[rel]:
            sz = os.stat(f).st_size
            if cur and cur_bytes + sz > target_bytes:
                groups.append((rel, cur))
                cur, cur_bytes = [], 0
            cur.append(f)
            cur_bytes += sz
        if cur:
            groups.append((rel, cur))
    return groups


@ray.remote
def _compact_one(group: list[str], out_path: str) -> dict:
    tables = [pq.read_table(f) for f in group]
    merged = pa.concat_tables(tables, promote_options="default")
    tmp = out_path + ".tmp"
    pq.write_table(merged, tmp)
    os.replace(tmp, out_path)  # atomic publish: readers never see partial files
    return {
        "out_path": out_path,
        "n_inputs": len(group),
        "n_rows": merged.num_rows,
        "bytes": os.stat(out_path).st_size,
    }


def compact_parquet(
    in_dir: str, out_dir: str, target_bytes: int = 128 << 20
) -> list[dict]:
    """Compact ``in_dir``'s parquet files into ``out_dir`` as
    ``part-{i:05d}.parquet`` files of ~``target_bytes`` input bytes
    each.  One Ray task per output file; an output part that already
    exists (from an interrupted earlier run) is skipped — the plan is
    deterministic, so its contents are already correct.  Returns one
    manifest row per output file."""
    os.makedirs(out_dir, exist_ok=True)
    groups = plan_compaction(in_dir, target_bytes)
    refs, done = [], []
    for i, (rel, group) in enumerate(groups):
        os.makedirs(os.path.join(out_dir, rel) if rel else out_dir, exist_ok=True)
        out_path = os.path.join(out_dir, rel, f"part-{i:05d}.parquet")
        if os.path.exists(out_path):
            done.append(
                {
                    "out_path": out_path,
                    "n_inputs": len(group),
                    "n_rows": pq.read_metadata(out_path).num_rows,
                    "bytes": os.stat(out_path).st_size,
                    "skipped": True,
                }
            )
            continue
        refs.append(_compact_one.remote(group, out_path))
    return done + [dict(r, skipped=False) for r in ray.get(refs)]
