"""Small-file compaction: deterministic plan, row preservation, size
bounds, resume-by-skip."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def fragmented(tmp_path):
    """40 small parquet files of 50 rows each."""
    d = tmp_path / "frag"
    d.mkdir()
    for i in range(40):
        t = pa.table(
            {
                "k": pa.array(range(i * 50, (i + 1) * 50), pa.int64()),
                "s": pa.array([f"row{j}" for j in range(i * 50, (i + 1) * 50)]),
            }
        )
        pq.write_table(t, d / f"shard-{i:03d}.parquet")
    return str(d)


def test_plan_is_deterministic_and_binned(fragmented):
    from tesseract_wasm_ray.pipelines.compaction import plan_compaction

    one = os.stat(os.path.join(fragmented, "shard-000.parquet")).st_size
    p1 = plan_compaction(fragmented, target_bytes=one * 8)
    p2 = plan_compaction(fragmented, target_bytes=one * 8)
    assert p1 == p2
    assert sum(len(g) for _, g in p1) == 40
    # ~8 inputs per group (first-fit over equal sizes)
    assert all(len(g) <= 8 for _, g in p1)
    assert 5 <= len(p1) <= 7
    assert all(rel == "" for rel, _ in p1)  # flat layout


def test_compact_preserves_rows_and_resumes(fragmented, tmp_path, ray_session):
    from tesseract_wasm_ray.pipelines.compaction import compact_parquet

    out = str(tmp_path / "compact")
    one = os.stat(os.path.join(fragmented, "shard-000.parquet")).st_size
    manifest = compact_parquet(fragmented, out, target_bytes=one * 8)
    files = sorted(os.listdir(out))
    assert len(files) == len(manifest)
    assert 5 <= len(files) <= 7
    got = pq.read_table(out).sort_by("k")
    assert got.num_rows == 2000
    assert got.column("k").to_pylist() == list(range(2000))
    # resume: a second run rewrites nothing
    again = compact_parquet(fragmented, out, target_bytes=one * 8)
    assert all(r["skipped"] for r in again)
    assert sorted(r["out_path"] for r in again) == sorted(
        r["out_path"] for r in manifest
    )


def test_oversized_file_gets_own_group(tmp_path):
    from tesseract_wasm_ray.pipelines.compaction import plan_compaction

    d = tmp_path / "mix"
    d.mkdir()
    big = pa.table({"k": pa.array(range(100000), pa.int64())})
    small = pa.table({"k": pa.array(range(10), pa.int64())})
    pq.write_table(big, d / "a-big.parquet")
    pq.write_table(small, d / "b-small.parquet")
    pq.write_table(small, d / "c-small.parquet")
    plan = plan_compaction(str(d), target_bytes=1024)
    assert plan[0][1] == [str(d / "a-big.parquet")]
    assert sum(len(g) for _, g in plan) == 3


def test_compact_preserves_hive_partitions(tmp_path, ray_session):
    import pyarrow.parquet as pq

    from tesseract_wasm_ray.pipelines.compaction import compact_parquet

    d = tmp_path / "hive"
    for lang in ("en", "fr"):
        (d / f"lang={lang}").mkdir(parents=True)
        for i in range(3):
            t = pa.table({"k": pa.array([i * 10 + j for j in range(10)], pa.int64())})
            pq.write_table(t, d / f"lang={lang}" / f"f{i}.parquet")
    out = str(tmp_path / "hive_out")
    manifest = compact_parquet(str(d), out, target_bytes=1 << 30)
    assert len(manifest) == 2  # one file per partition
    got = pq.read_table(out)  # hive column reconstructed from the path
    assert got.num_rows == 60
    assert set(got.column("lang").to_pylist()) == {"en", "fr"}


def test_scan_parquet_safe_quarantines_corrupt_files(tmp_path):
    """A truncated parquet file lands in the quarantine manifest; the
    good files read cleanly."""
    import json

    import pyarrow.parquet as pq

    from tesseract_wasm_ray.sources.documents import scan_parquet_safe

    d = tmp_path / "ingest"
    d.mkdir()
    for i in range(3):
        pq.write_table(
            pa.table({"k": pa.array(range(10), pa.int64())}),
            d / f"ok-{i}.parquet",
        )
    # corrupt file: valid prefix, truncated footer
    raw = (d / "ok-0.parquet").read_bytes()
    (d / "bad-truncated.parquet").write_bytes(raw[: len(raw) // 2])
    (d / "bad-garbage.parquet").write_bytes(b"not parquet at all")

    man = str(tmp_path / "quarantine.jsonl")
    good, bad = scan_parquet_safe(str(d), quarantine_manifest=man)
    assert len(good) == 3 and len(bad) == 2
    assert all("ok-" in g for g in good)
    assert {json.loads(l)["path"].split("/")[-1] for l in open(man)} == {
        "bad-truncated.parquet",
        "bad-garbage.parquet",
    }
    # good files remain fully readable
    t = pq.read_table(good)
    assert t.num_rows == 30
