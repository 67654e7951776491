"""Local stand-in for the driver's correctness gate: run every
__ray_entry__ query at a given sf and, where an oracle exists, compare
against DuckDB (row count + sorted-column schema + order-insensitive
value comparison).  Usage::

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def dtype_kinds(df: pd.DataFrame) -> list[str]:
    """int-vs-float kind per column BEFORE canon's coercion — the
    driver's value-hash is dtype-sensitive (a DuckDB HUGEINT sum
    arriving as float64 hash-mismatches an int64 Ray column even when
    values are equal), so kinds must match exactly."""
    return [
        "int" if pd.api.types.is_integer_dtype(df[c])
        else "float" if pd.api.types.is_float_dtype(df[c])
        else str(df[c].dtype)
        for c in sorted(df.columns)
    ]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            raw = to_pandas(fn(sf_dir))
            got = canon(raw)
        except Exception as ex:
            failures.append(name)
            print(f"[FAIL-run ] {name}: {type(ex).__name__}: {ex}")
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows, cols={list(got.columns)} ({dt:.1f}s)")
            continue
        raw_want = con.sql(oracles[name]).df()
        want = canon(raw_want)
        if dtype_kinds(raw) != dtype_kinds(raw_want):
            failures.append(name)
            print(
                f"[FAIL-dtyp] {name}: ray={dtype_kinds(raw)} oracle={dtype_kinds(raw_want)}"
            )
            continue
        if len(got) != len(want):
            failures.append(name)
            print(f"[FAIL-rows] {name}: ray={len(got)} oracle={len(want)}")
            continue
        if list(got.columns) != list(want.columns):
            failures.append(name)
            print(f"[FAIL-cols] {name}: ray={list(got.columns)} oracle={list(want.columns)}")
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=0, atol=0)
        except AssertionError as ex:
            failures.append(name)
            print(f"[FAIL-vals] {name}: {str(ex).splitlines()[-1]}")
            continue
        print(f"[OK       ] {name}: {len(got)} rows match oracle ({dt:.1f}s)")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall checks passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
