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


def test_repetition_stats_planted():
    from tesseract_wasm_ray.functions.textstats import repetition_stats

    out = repetition_stats(
        _t(
            [
                "spam spam spam spam spam spam spam spam spam spam",
                "alpha beta gamma delta epsilon zeta eta theta iota kappa",
                "ab cd ab cd ab cd ab cd ab cd",
                "",
            ]
        )
    )
    top = out.column("top_unigram_frac").to_pylist()
    dup = out.column("dup_bigram_frac").to_pylist()
    keep = out.column("keep").to_pylist()
    assert top[0] == 1.0 and keep[0] == 0  # pure repetition dropped
    assert top[1] == 0.1 and dup[1] == 0.0 and keep[1] == 1  # all distinct
    # "ab cd" x5: bigrams = 9, distinct = 2 ("ab cd", "cd ab")
    # metrics are published rounded to 6dp
    assert abs(dup[2] - (1 - 2 / 9)) < 1e-6 and keep[2] == 0
    assert out.column("n_tokens").to_pylist()[3] == 0 and dup[3] == 0.0


def test_repetition_stats_bigrams_do_not_cross_rows():
    from tesseract_wasm_ray.functions.textstats import repetition_stats

    # last token of row 0 + first token of row 1 must NOT form a bigram:
    # each row's bigrams are all-distinct within the row
    out = repetition_stats(_t(["x y", "y x"]))
    assert out.column("dup_bigram_frac").to_pylist() == [0.0, 0.0]


def test_chunk_tokens_boundaries_and_roundtrip():
    from tesseract_wasm_ray.functions.textstats import chunk_tokens

    toks = [f"t{i}" for i in range(70)]
    t = pa.table({"doc_id": [7, 8, 9], "text": [" ".join(toks), "a b", ""]})
    out = chunk_tokens(t, chunk_size=32)
    df = out.to_pandas()
    d7 = df[df.doc_id == 7]
    assert list(d7.chunk_id) == [0, 1, 2]
    assert list(d7.n_chunk_tokens) == [32, 32, 6]
    assert " ".join(d7.chunk_text) == " ".join(toks)  # exact round-trip
    assert df[df.doc_id == 8].chunk_text.tolist() == ["a b"]
    assert 9 not in set(df.doc_id)  # empty doc emits zero chunks


def test_chunk_tokens_exact_multiple():
    from tesseract_wasm_ray.functions.textstats import chunk_tokens

    t = pa.table({"doc_id": [1], "text": [" ".join(["w"] * 64)]})
    df = chunk_tokens(t, chunk_size=32).to_pandas()
    assert list(df.n_chunk_tokens) == [32, 32]  # no empty trailing chunk


def test_ngram_strings_matches_naive():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tesseract_wasm_ray.functions.textstats import ngram_strings

    words = st.lists(
        st.sampled_from(["Alpha", "beta", "G", "dd", "e5"]), min_size=0, max_size=9
    )

    @settings(max_examples=40, deadline=None)
    @given(st.lists(words, min_size=1, max_size=5), st.integers(2, 4))
    def prop(rows, n):
        texts = pa.array([" ".join(r) for r in rows])
        grams, parents, n_rows = ngram_strings(texts, n)
        assert n_rows == len(rows)
        want = []
        for ri, r in enumerate(rows):
            toks = [t.lower() for t in r]
            for i in range(len(toks) - n + 1):
                want.append((ri, " ".join(toks[i : i + n])))
        got = list(zip(parents.tolist(), grams.to_pylist()))
        assert got == want

    prop()


def test_char_pair_partials_matches_counter():
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tesseract_wasm_ray.functions.textstats import char_pair_partials

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.text(alphabet="abXY ", max_size=12), min_size=1, max_size=4))
    def prop(texts):
        t = pa.table({"text": pa.array(texts, pa.string())})
        got = dict(
            zip(*[c.to_pylist() for c in char_pair_partials(t).columns])
        )
        want: Counter = Counter()
        for txt in texts:
            for tok in txt.lower().split():
                for i in range(len(tok) - 1):
                    want[tok[i : i + 2]] += 1
        assert got == dict(want)

    prop()
