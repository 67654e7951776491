"""Unit tests for the vectorized text-analysis kernels (no Ray needed —
pure pa.Table -> pa.Table functions)."""

import hashlib

import numpy as np
import pyarrow as pa

from tesseract_wasm_ray.functions.textstats import (
    detect_language,
    fingerprint,
    text_quality,
    token_count,
)


def _t(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_token_count_whitespace_and_bpe():
    out = token_count(_t(["hello world", "a  b\tc", "", "one, two!"]))
    assert out.column("n_tokens").to_pylist() == [2, 3, 0, 2]
    # BPE-ish: "one" "," "two" "!" = 4 pieces
    assert out.column("n_bpe_tokens").to_pylist()[3] == 4


def test_quality_metrics_exact():
    out = text_quality(_t(["the the the", "alpha beta gamma delta"]))
    assert out.column("n_tokens").to_pylist() == [3, 4]
    assert out.column("n_distinct").to_pylist() == [1, 4]
    assert out.column("distinct_ratio").to_pylist() == [1 / 3, 1.0]
    # "the" is an English stopword
    assert out.column("stopword_ratio").to_pylist()[0] == 1.0
    q = out.column("quality").to_pylist()
    assert all(0.0 <= v <= 1.0 for v in q)
    assert q[1] > q[0]  # diverse text scores higher than repeated stopwords


def test_quality_empty_text_is_zero():
    out = text_quality(_t([""]))
    assert out.column("quality").to_pylist() == [0.0]
    assert out.column("n_tokens").to_pylist() == [0]


def test_language_detection_heuristic():
    out = detect_language(
        _t(
            [
                "the cat sat on the mat and it is this",
                "el perro que se come la comida en el parque",
                "le chat est dans la maison et il ne dort pas",
                "der hund ist nicht in dem haus und auch nicht im garten",
                "zzz qqq xxx",  # no profile hits
            ]
        )
    )
    assert out.column("lang_pred").to_pylist() == ["en", "es", "fr", "de", "und"]


def test_fingerprint_md5_matches_hashlib_and_rolling_is_order_sensitive():
    texts = ["alpha beta", "beta alpha", "alpha beta", ""]
    out = fingerprint(_t(texts))
    md5s = out.column("md5").to_pylist()
    assert md5s[0] == hashlib.md5(b"alpha beta").hexdigest()
    assert md5s[0] == md5s[2]
    rolls = out.column("rolling_hash").to_pylist()
    assert rolls[0] == rolls[2]
    assert rolls[0] != rolls[1]  # order-sensitive
    assert rolls[3] == 0


def test_rolling_hash_vectorization_matches_scalar_reference():
    rng = np.random.default_rng(3)
    words = ["w%d" % i for i in range(40)]
    texts = [
        " ".join(rng.choice(words, size=int(rng.integers(1, 15))))
        for _ in range(50)
    ]
    out = fingerprint(_t(texts))
    import hashlib

    def scalar(text):
        # Plain-python Horner over md5-first-8-byte token hashes — the
        # published fingerprint spec (also recomputed by the DuckDB
        # oracle in pipelines/oracles.py).
        h = 0
        toks = text.lower().split()
        for t in toks:
            x = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
            h = ((h * 1099511628211) % (1 << 64)) ^ x
        return h - (1 << 64) if h >= (1 << 63) else h

    assert out.column("rolling_hash").to_pylist() == [scalar(t) for t in texts]
