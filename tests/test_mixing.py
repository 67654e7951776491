"""Per-domain mixture sampling (pipelines/mixing.py)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from tesseract_wasm_ray.pipelines.mixing import (
    _HEX_DIGITS,
    mixture_sample,
    rate_threshold_hex,
)


def test_rate_threshold_edges():
    assert rate_threshold_hex(0.0) == (0, "0" * _HEX_DIGITS)
    assert rate_threshold_hex(1.0) == (1, "0" * _HEX_DIGITS)
    base, thr = rate_threshold_hex(2.5)
    assert base == 2 and thr == "8" + "0" * (_HEX_DIGITS - 1)
    with pytest.raises(ValueError):
        rate_threshold_hex(-0.1)


def _table(n=400):
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "source": pa.array([f"s{i % 4}" for i in range(n)]),
        }
    )


def test_mixture_sample_matches_local_rule(ray_session):
    import ray.data as rd

    rates = {"s0": 2.5, "s1": 1.0, "s2": 0.4, "s3": 0.0}
    out = (
        mixture_sample(rd.from_arrow(_table()).repartition(6), rates)
        .to_pandas()
        .sort_values(["doc_id", "rep"])
        .reset_index(drop=True)
    )
    want = []
    for i in range(400):
        src = f"s{i % 4}"
        base, thr = rate_threshold_hex(rates[src])
        pref = hashlib.md5(str(i).encode()).hexdigest()[:_HEX_DIGITS]
        n_copies = base + (pref < thr)
        want.extend((i, src, r) for r in range(1, n_copies + 1))
    got = list(out.itertuples(index=False, name=None))
    assert got == want
    # sanity: upsampled domain has >100 base copies, dropped domain none
    assert sum(1 for _, s, _ in want if s == "s0") >= 200
    assert not any(s == "s3" for _, s, _ in want)


def test_mixture_sample_rerun_and_partition_stable(ray_session):
    import ray.data as rd

    rates = {"s0": 0.5}
    a = mixture_sample(rd.from_arrow(_table()).repartition(2), rates, 0.3).to_pandas()
    b = mixture_sample(rd.from_arrow(_table()).repartition(9), rates, 0.3).to_pandas()
    key = lambda df: sorted(map(tuple, df.to_numpy()))  # noqa: E731
    assert key(a) == key(b)


def test_temperature_rates_exact_properties():
    from fractions import Fraction
    import math

    from tesseract_wasm_ray.pipelines.mixing import _HEX_DIGITS, temperature_rates

    counts = {"en": 218, "de": 70, "es": 73, "fr": 64, "zh": 75}
    budget = sum(counts.values()) // 2
    resolved = temperature_rates(counts, budget)
    S = sum(math.isqrt(c) for c in counts.values())
    for s, c in counts.items():
        base, thr = resolved[s]
        exact = Fraction(budget * math.isqrt(c), S * c)
        # base is the integer part, threshold the 13-hex-digit floor of
        # the fractional part — both exact
        assert base == exact.numerator // exact.denominator
        frac = exact - base
        assert int(thr, 16) == (frac.numerator * 16**_HEX_DIGITS) // frac.denominator
    # alpha=0.5 rebalances: the rare lang's rate beats the dominant one
    rate = lambda s: resolved[s][0] + int(resolved[s][1], 16) / 16.0**_HEX_DIGITS  # noqa: E731
    assert rate("fr") > rate("en")
    # expected output size stays within one doc per domain of budget
    expected = sum(
        (resolved[s][0] + int(resolved[s][1], 16) / 16.0**_HEX_DIGITS) * c
        for s, c in counts.items()
    )
    assert abs(expected - budget) < len(counts)
