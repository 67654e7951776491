"""Training-prep operator tests: bigram LM partials/perplexity,
benchmark decontamination — hand-computed expectations on tiny
corpora."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from tesseract_wasm_ray.functions.textstats import bigram_partials


def test_bigram_partials_counts():
    t = pa.table({"doc_id": [0, 1], "text": ["a b a b", "a c"]})
    out = bigram_partials(t).to_pandas().set_index(["w1", "w2"])["cnt"]
    assert out[("a", "b")] == 2
    assert out[("b", "a")] == 1
    assert out[("a", "c")] == 1
    assert len(out) == 3


def test_bigram_partials_no_cross_row_pairs():
    # last token of row 0 and first of row 1 must not pair
    t = pa.table({"doc_id": [0, 1], "text": ["x y", "y z"]})
    out = bigram_partials(t).to_pandas()
    pairs = set(zip(out.w1, out.w2))
    assert ("y", "y") not in pairs
    assert pairs == {("x", "y"), ("y", "z")}


def _write_docs(tmp_path, rows):
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array(["s"] * len(rows)),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_lm_perplexity_hand_computed(ray_session, tmp_path):
    from tesseract_wasm_ray.pipelines.queries import q_lm_perplexity

    sf = _write_docs(tmp_path, [(0, "a b a b"), (1, "a c")])
    out = q_lm_perplexity(sf).to_pandas().set_index("doc_id")
    # corpus bigrams: (a,b) x2, (b,a) x1, (a,c) x1; heads: a -> 3, b -> 1
    # doc0: surprisals [-ln(2/3), -ln(1/1), -ln(2/3)]
    exp0 = math.exp((2 * math.log(3 / 2)) / 3)
    # doc1: [-ln(1/3)]
    exp1 = 3.0
    assert out.loc[0, "n_bigrams"] == 3
    assert abs(out.loc[0, "perplexity"] - round(exp0, 4)) < 1e-9
    assert abs(out.loc[1, "perplexity"] - round(exp1, 4)) < 1e-9


def test_decontaminate_planted_overlap(ray_session, tmp_path):
    from tesseract_wasm_ray.pipelines.queries import q_decontaminate

    shared = "one two three four five"
    rows = [
        (0, f"lead {shared} tail"),        # benchmark doc (0 % 29 == 0)
        (1, f"{shared} something else"),   # shares the 5-gram -> flagged
        (2, "totally different words here with no overlap at all"),
        (3, "one two three foul five gap"),  # 4-gram overlap only -> clean
    ]
    out = (
        q_decontaminate(_write_docs(tmp_path, rows))
        .to_pandas()
        .set_index("doc_id")["contaminated"]
    )
    assert out.loc[0] == 1  # benchmark self-flags
    assert out.loc[1] == 1
    assert out.loc[2] == 0
    assert out.loc[3] == 0


def test_global_rank_matches_duckdb(ray_session, tmp_path):
    import duckdb

    from tesseract_wasm_ray.pipelines.queries import q_global_rank

    rows = [(i, "x " * ((i * 7) % 13 + 1)) for i in range(60)]  # many ties
    sf = _write_docs(tmp_path, rows)
    got = (
        q_global_rank(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[["doc_id", "n_chars", "rank"]]
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    exp = (
        con.execute(
            "SELECT doc_id, n_chars, row_number() OVER "
            "(ORDER BY n_chars DESC, doc_id ASC) AS rank FROM documents"
        )
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (got["rank"].to_numpy() == exp["rank"].to_numpy()).all()


def test_heavy_hitters_exact_vs_bruteforce(ray_session, tmp_path):
    from collections import Counter

    from tesseract_wasm_ray.pipelines.queries import q_heavy_hitters

    # skewed corpus: 'hot' terms dominate, long tail of rare terms
    rows = []
    for i in range(40):
        toks = (["hot"] * 6 + ["warm"] * 3 + [f"rare{i}_{j}" for j in range(4)])
        rows.append((i, " ".join(toks)))
    sf = _write_docs(tmp_path, rows)
    got = q_heavy_hitters(sf, k=10).set_index("term")["cnt"]

    counts = Counter()
    for _, text in rows:
        counts.update(text.lower().split())
    total = sum(counts.values())
    expect = {t: c for t, c in counts.items() if c > total / 10}
    assert dict(got) == expect
    assert "hot" in got.index and "warm" in got.index
    assert not any(t.startswith("rare") for t in got.index)
