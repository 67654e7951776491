"""Deterministic per-domain mixture sampling (data-mixing weights).

The "mix sources at target rates" stage of a training-data pipeline
(Pile/DoReMi-style domain weights): every document is kept
``floor(rate)`` times plus one more iff a content-keyed uniform falls
under ``frac(rate)`` — so rates above 1 UPSAMPLE by exact replication
and rates below 1 downsample, all rerun/reshard-stable (no RNG state,
no seed-per-worker coupling).

The uniform is the md5 hex prefix of the document id compared against
a 13-hex-digit threshold STRING — the same device dataset_split uses —
so the DuckDB oracle reproduces the decision with a lexicographic
substr() compare, no float in sight.  100 TB shape: pure map-side
filter/replicate, NO shuffle of any kind; replication multiplies rows
inside the batch before they ever leave the task.

Reference scope note: the reference engine (robertknight/tesseract-wasm)
has no sampling surface; this is part of the training-data operator
suite the driver brief adds.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.arrow_util import single_chunk as _single_chunk
from ..functions.fastmd5 import md5_hex

__all__ = ["mixture_sample", "rate_threshold_hex", "temperature_rates"]

_HEX_DIGITS = 13  # 16**13 < 2**53: exact in a python float and a BIGINT


def rate_threshold_hex(rate: float) -> tuple[int, str]:
    """rate -> (base copies, hex threshold for one extra copy).

    The threshold is the first ``_HEX_DIGITS`` md5 hex chars; a row
    gains the extra copy iff its prefix sorts strictly below it.  Both
    engines share the exact literal, so the decision is string-compare
    deterministic."""
    if rate < 0:
        raise ValueError(f"negative rate: {rate}")
    base = math.floor(rate)
    frac = rate - base
    thr = format(int(frac * (16**_HEX_DIGITS)), f"0{_HEX_DIGITS}x")
    return base, thr


def temperature_rates(
    counts: dict[str, int], budget: int,
) -> dict[str, tuple[int, str]]:
    """Temperature (alpha = 0.5) resampling rates from exact integer
    corpus counts — the multilingual rebalancing rule (XLM-R/mT5-style
    p_s ∝ c_s^alpha) with NO float step anywhere: the domain weight is
    ``isqrt(c_s)`` (exact; floor(sqrt) in the SQL mirror agrees for
    any c < 2^40), and the per-domain rate budget·w_s / (S·c_s)
    resolves straight to (base copies, 13-hex threshold) by integer
    division — Python big ints here, HUGEINT in the oracle — so the
    sampling decision is bit-identical on both engines."""
    w = {s: math.isqrt(int(c)) for s, c in counts.items()}
    S = sum(w.values())
    out: dict[str, tuple[int, str]] = {}
    for s, c in counts.items():
        num, den = budget * w[s], S * int(c)
        base = num // den
        thr_int = ((num % den) * (16**_HEX_DIGITS)) // den
        out[s] = (base, format(thr_int, f"0{_HEX_DIGITS}x"))
    return out


def mixture_sample(
    ds: rd.Dataset,
    rates: dict[str, float],
    default_rate: float = 0.0,
    source_col: str = "source",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
    resolved_rates: dict[str, tuple[int, str]] | None = None,
) -> rd.Dataset:
    """Sample/replicate each row at its domain's target rate.

    Output: (id_col, source_col [, keep_cols], rep) where ``rep``
    numbers a row's copies 1..n — rates > 1 emit multiple rows (exact
    integer part guaranteed, fractional part hash-gated), rates < 1
    keep the row with probability ~rate, always the same rows on
    rerun.  Entirely map-side: one streaming pass, zero shuffles.

    ``resolved_rates`` bypasses the float->threshold conversion with
    caller-computed exact (base copies, hex threshold) pairs — used by
    temperature mixing, whose thresholds derive from integer corpus
    counts with no float step at all."""
    resolved = (
        resolved_rates
        if resolved_rates is not None
        else {s: rate_threshold_hex(r) for s, r in rates.items()}
    )
    default = rate_threshold_hex(default_rate)

    def fn(b: pa.Table) -> pa.Table:
        n = b.num_rows
        out_cols = [id_col, source_col, *keep_cols]
        if n == 0:
            cols = {c: b.column(c) for c in out_cols}
            cols["rep"] = pa.array([], pa.int64())
            return pa.table(cols)
        # Per-DISTINCT-source rate lookup (vectorized via dictionary).
        src_enc = _single_chunk(b.column(source_col)).dictionary_encode()
        dict_vals = src_enc.dictionary.to_pylist()
        base_d = np.array(
            [resolved.get(s, default)[0] for s in dict_vals], np.int64
        )
        thr_d = np.array([resolved.get(s, default)[1] for s in dict_vals])
        codes = src_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # vectorized digest (functions/fastmd5.py): same md5-hex-prefix
        # uniform as before, no per-row Python on this map path; the
        # per-row threshold compare stays in Arrow too.
        prefix = md5_hex(b.column(id_col), prefix=_HEX_DIGITS)
        extra = pc.less(prefix, pa.array(thr_d[codes], pa.string()))
        copies = base_d[codes] + extra.to_numpy(zero_copy_only=False)
        total = int(copies.sum())
        row_idx = np.repeat(np.arange(n), copies)
        # rep = position within the row's copy run, 1-based.
        starts = np.repeat(np.cumsum(copies) - copies, copies)
        rep = np.arange(total) - starts + 1
        take = pa.array(row_idx, pa.int64())
        cols = {c: _single_chunk(b.column(c)).take(take) for c in out_cols}
        cols["rep"] = pa.array(rep.astype(np.int64), pa.int64())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def sql_mixture_sample(
    rates: dict[str, float],
    default_rate: float = 0.0,
    table: str = "documents",
) -> str:
    """DuckDB mirror: the same (base, threshold-hex) pairs rendered as
    CASE branches; copies expand through generate_series."""
    resolved = {s: rate_threshold_hex(r) for s, r in rates.items()}
    dbase, dthr = rate_threshold_hex(default_rate)
    base_case = (
        "CASE source "
        + " ".join(f"WHEN '{s}' THEN {b}" for s, (b, _) in sorted(resolved.items()))
        + f" ELSE {dbase} END"
    )
    thr_case = (
        "CASE source "
        + " ".join(f"WHEN '{s}' THEN '{t}'" for s, (_, t) in sorted(resolved.items()))
        + f" ELSE '{dthr}' END"
    )
    return f"""
WITH par AS (
    SELECT doc_id, source,
           ({base_case})
           + CASE WHEN substr(md5(doc_id::VARCHAR), 1, {_HEX_DIGITS})
                       < ({thr_case}) THEN 1 ELSE 0 END AS n_copies
    FROM {table}
)
SELECT doc_id, source, unnest(generate_series(1, n_copies)) AS rep
FROM par WHERE n_copies > 0
"""
