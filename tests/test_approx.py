"""HyperLogLog approximate-distinct (pipelines/approx.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from tesseract_wasm_ray.functions.sketch import hash_string_array
from tesseract_wasm_ray.pipelines.approx import (
    _bitlen_u64,
    _mix64,
    approx_distinct,
    hll_estimate,
)


def test_bitlen_u64_exact():
    vals = np.array(
        [0, 1, 2, 3, 4, (1 << 53) - 1, 1 << 53, (1 << 53) + 1, (1 << 63), (1 << 64) - 1],
        dtype=np.uint64,
    )
    got = _bitlen_u64(vals)
    want = np.array([int(v).bit_length() for v in vals.tolist()], np.int64)
    assert np.array_equal(got, want)


def test_hll_estimate_accuracy_raw_branch():
    """n >> 2.5*m forces the raw harmonic-mean branch; standard error
    is ~1.04/sqrt(m) so 3 sigma at m=512 is ~14%."""
    p = 9
    m = 1 << p
    n = 50_000
    vals = pa.array([f"v{i}" for i in range(n)])
    h = _mix64(hash_string_array(vals))
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    bl = np.array([int(x).bit_length() for x in w.tolist()])
    rho = np.where(w == 0, 64 - p + 1, 64 - p - bl + 1)
    regs = np.zeros(m, np.int64)
    np.maximum.at(regs, reg, rho)
    est = hll_estimate(regs, p)
    assert est > 2.5 * m, "must exercise the raw branch"
    assert abs(est - n) / n < 0.14, est


def test_hll_estimate_linear_counting_small():
    """Small cardinality hits the linear-counting branch and is tight
    there (~10 expected register collisions at n=100, m=512 put the
    estimator's sigma at a few %; 6% is a ~2-sigma bound)."""
    p = 9
    vals = pa.array([f"u{i}" for i in range(100)])
    h = _mix64(hash_string_array(vals))
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    regs = np.zeros(1 << p, np.int64)
    np.maximum.at(regs, reg, 1)  # any rho >= 1 marks the register
    est = hll_estimate(regs, p)
    assert est <= 2.5 * (1 << p), "must exercise linear counting"
    assert abs(est - 100) / 100 < 0.06, est


def test_hll_estimate_rejects_bad_register_count():
    with pytest.raises(ValueError):
        hll_estimate(np.zeros(100, np.int64), p=9)


def test_approx_distinct_merges_across_blocks(ray_session):
    """The same value appearing in many blocks must count once: a
    2-key dataset split over 8 blocks with heavy repetition gives the
    same estimate as the single-block sketch of the distinct values."""
    import ray.data as rd

    n_distinct = {"a": 400, "b": 37}
    rows = []
    for key, n in n_distinct.items():
        for rep in range(5):  # every value appears 5x across blocks
            rows.extend({"k": key, "v": f"{key}-{i}"} for i in range(n))
    t = pa.Table.from_pylist(rows)
    ds = rd.from_arrow(t).repartition(8)
    out = approx_distinct(ds, "k", "v", p=9).to_pandas().set_index("k")

    for key, n in n_distinct.items():
        p = 9
        vals = pa.array([f"{key}-{i}" for i in range(n)])
        h = _mix64(hash_string_array(vals))
        reg = (h >> np.uint64(64 - p)).astype(np.int64)
        w = h & np.uint64((1 << (64 - p)) - 1)
        bl = np.array([int(x).bit_length() for x in w.tolist()])
        rho = np.where(w == 0, 64 - p + 1, 64 - p - bl + 1)
        regs = np.zeros(1 << p, np.int64)
        np.maximum.at(regs, reg, rho)
        want = round(hll_estimate(regs, p), 3)
        assert out.loc[key, "approx_distinct"] == want, key


def test_approx_distinct_int_values_match_string_form(ray_session):
    """Int values sketch via their decimal string (== SQL ::VARCHAR):
    int64 and string columns with the same rendered values agree."""
    import ray.data as rd

    ints = pa.table({"k": ["x"] * 1000, "v": pa.array(range(1000), pa.int64())})
    strs = pa.table({"k": ["x"] * 1000, "v": pa.array([str(i) for i in range(1000)])})
    a = approx_distinct(rd.from_arrow(ints), "k", "v", p=8).to_pandas()
    b = approx_distinct(rd.from_arrow(strs), "k", "v", p=8).to_pandas()
    assert a["approx_distinct"][0] == b["approx_distinct"][0]


def test_approx_quantiles_accuracy_and_partition_invariance(ray_session):
    """Uniform values: each quantile lands within one bin width of the
    true quantile, and block layout cannot change a single bit."""
    import ray.data as rd

    from tesseract_wasm_ray.pipelines.approx import approx_quantiles

    vals = (np.arange(10_000, dtype=np.float64) * 7919.0) % 10_000.0  # shuffled
    t = pa.table({"v": pa.array(vals)})
    a = approx_quantiles(
        rd.from_arrow(t).repartition(1), "v", (0.5, 0.9), 0.0, 10_000.0, 512
    )
    b = approx_quantiles(
        rd.from_arrow(t).repartition(16), "v", (0.5, 0.9), 0.0, 10_000.0, 512
    )
    assert a.equals(b)
    width = 10_000.0 / 512
    got = dict(zip(a.column("quantile").to_pylist(), a.column("approx_value").to_pylist()))
    assert abs(got[0.5] - 5000.0) <= width
    assert abs(got[0.9] - 9000.0) <= width


def test_approx_quantiles_clips_out_of_range(ray_session):
    import ray.data as rd

    from tesseract_wasm_ray.pipelines.approx import approx_quantiles

    t = pa.table({"v": pa.array([-50.0, 0.5, 999.0])})
    out = approx_quantiles(rd.from_arrow(t), "v", (0.0, 1.0), 0.0, 1.0, 4)
    v = out.column("approx_value").to_pylist()
    assert v[0] == 0.125  # min clipped into bin 0
    assert v[1] == 0.875  # max clipped into the last bin


def test_approx_quantiles_rejects_bad_range():
    import pytest as _pt

    from tesseract_wasm_ray.pipelines.approx import approx_quantiles

    with _pt.raises(ValueError):
        approx_quantiles(None, "v", (0.5,), 1.0, 1.0, 10)
