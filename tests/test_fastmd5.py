"""Parity tests for the DuckDB-backed vectorized md5 kernel: it must
be bit-identical to the ``hashlib.md5(s.encode()).hexdigest()`` loops
it replaces, including the null-as-empty-string convention."""

import hashlib

import pyarrow as pa

from tesseract_wasm_ray.functions.fastmd5 import md5_hex


def _ref(values):
    return [hashlib.md5(((v if v is not None else "")).encode()).hexdigest() for v in values]


def test_parity_basic():
    vals = ["", "a", "abc", "hello world", "x" * 600, "doc_00000042"]
    got = md5_hex(pa.array(vals, pa.string())).to_pylist()
    assert got == _ref(vals)


def test_parity_nulls_hash_as_empty():
    vals = [None, "a", None]
    got = md5_hex(pa.array(vals, pa.string())).to_pylist()
    assert got == _ref(vals)


def test_parity_unicode_utf8_bytes():
    vals = ["héllo", "naïve café", "日本語テキスト"]
    got = md5_hex(pa.array(vals, pa.string())).to_pylist()
    assert got == _ref(vals)


def test_prefix_matches_slice():
    vals = ["alpha", "beta", "gamma" * 50]
    got = md5_hex(pa.array(vals, pa.string()), prefix=13).to_pylist()
    assert got == [h[:13] for h in _ref(vals)]


def test_int_ids_cast_like_str():
    ids = pa.array([0, 7, 123456789], pa.int64())
    got = md5_hex(ids).to_pylist()
    assert got == [hashlib.md5(str(i).encode()).hexdigest() for i in [0, 7, 123456789]]


def test_chunked_and_empty():
    ch = pa.chunked_array([pa.array(["a", "b"]), pa.array(["c"])])
    assert md5_hex(ch).to_pylist() == _ref(["a", "b", "c"])
    assert md5_hex(pa.array([], pa.string())).to_pylist() == []


def test_sliced_input_offset():
    arr = pa.array(["skip", "keep1", "keep2"], pa.string()).slice(1)
    assert md5_hex(arr).to_pylist() == _ref(["keep1", "keep2"])


def test_fallback_path_matches(monkeypatch):
    """If the DuckDB kernel is unavailable, the hashlib fallback must
    produce identical digests (including null-as-empty and prefixes)."""
    import builtins

    import tesseract_wasm_ray.functions.fastmd5 as fm

    real_import = builtins.__import__

    def no_duckdb(name, *a, **k):
        if name == "duckdb":
            raise ImportError("blocked for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(fm._LOCAL, "con", None, raising=False)
    monkeypatch.setattr(builtins, "__import__", no_duckdb)
    vals = [None, "", "abc", "x" * 300]
    got = fm.md5_hex(pa.array(vals, pa.string()), prefix=13).to_pylist()
    monkeypatch.setattr(builtins, "__import__", real_import)
    assert got == [h[:13] for h in _ref(vals)]
