"""Deduplication pipelines over a documents-style table.

Five dedup families (driver brief: first-class training-data operators):

- :func:`exact_dedup` — md5-of-text hash-partition + keep-min-id;
- :func:`minhash_lsh_dedup` — word-shingle MinHash -> banded LSH buckets
  -> signature-Jaccard verify vs the bucket representative;
- :func:`simhash_dedup` — 64-bit SimHash -> pigeonhole block buckets ->
  hamming-distance verify;
- :func:`ngram_jaccard_dedup` — MinHash-LSH candidates -> EXACT word
  n-gram Jaccard verification via pair joins back to the text;
- :func:`embedding_neardup` — random-hyperplane sign-LSH buckets ->
  exact cosine verify.

Scale shape (100 TB): every family is
``map_batches (sketch, vectorized) -> groupby(bucket) (the one
all-to-all, moving only small sketch rows — never full text except in
the exact-Jaccard verify joins, which move only candidate PAIRS) ->
anti-join of the dup-id set against the corpus (broadcast is_in
filter by default; bucketed shuffle filter for huge dup sets —
``anti_join_ids``)``.  "Keep"
semantics are deterministic: the surviving row of a duplicate group is
the one with the minimum id.

Buckets are crc32-stable across processes (stages/reassemble.py
pattern), so re-runs produce identical partitions.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
from ..functions.arrow_util import single_chunk as _single_chunk
import pyarrow.compute as pc
import ray.data as rd

from ..functions.sketch import (
    hamming_distance,
    lsh_band_keys,
    minhash_signatures,
    shingle_hashes,
    signature_jaccard,
    simhash,
    simhash_blocks,
)






def _crc_bucket_i64(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    """Stable bucket of an int64 key array (arithmetic, vectorized)."""
    with np.errstate(over="ignore"):
        mixed = (keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
    return (mixed % np.uint64(num_buckets)).astype(np.int32)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def keep_min_by(
    ds: rd.Dataset, key_col: str, order_col: str, num_buckets: int = 64,
    shuffle_partitions: int = 16,
) -> rd.Dataset:
    """Keep, per distinct ``key_col`` value, the single row with the
    minimum ``order_col``.  Hash-bucket the key (bounded group count),
    one vectorized sort + boundary-take per bucket.  Input blocks are
    coalesced first (sort-shuffle cost is per-block, docs/RAY_NOTES.md §3).
    """

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col)
        if pa.types.is_integer(keys.type):
            b = _crc_bucket_i64(
                keys.to_numpy(zero_copy_only=False).astype(np.int64), num_buckets
            )
        else:
            enc = _single_chunk(pc.dictionary_encode(keys))
            lut = np.array(
                [zlib.crc32(str(v).encode()) % num_buckets for v in enc.dictionary.to_pylist()],
                dtype=np.int32,
            )
            b = lut[enc.indices.to_numpy(zero_copy_only=False)] if len(lut) else np.empty(0, np.int32)
        return batch.append_column("__bucket", pa.array(b, pa.int32()))

    def first_per_key(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["__bucket"]).sort_by(
            [(key_col, "ascending"), (order_col, "ascending")]
        )
        if t.num_rows == 0:
            return t
        keys = _single_chunk(t.column(key_col))
        neq = pc.not_equal(keys.slice(1), keys.slice(0, len(keys) - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.flatnonzero(np.r_[True, neq])
        return t.take(pa.array(starts, pa.int64()))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .repartition(shuffle_partitions)
        .groupby("__bucket", num_partitions=shuffle_partitions)
        .map_groups(first_per_key, batch_format="pyarrow")
    )


def exact_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Exact dedup on md5(text): one survivor (min id) per distinct text."""
    import hashlib

    def add_md5(b: pa.Table) -> pa.Table:
        texts = _single_chunk(b.column(text_col)).to_pylist()
        md5s = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
        return b.append_column("md5", pa.array(md5s, pa.string()))

    with_md5 = ds.map_batches(add_md5, batch_format="pyarrow")
    return keep_min_by(with_md5, "md5", id_col, num_buckets).drop_columns(["md5"])


# ---------------------------------------------------------------------------
# bucketed candidate machinery (MinHash / SimHash / embedding LSH)
# ---------------------------------------------------------------------------


def _dup_ids_from_buckets(
    bucket_rows: rd.Dataset,
    key_col: str,
    id_col: str,
    verify,
    num_buckets: int = 64,
    id_type: pa.DataType | None = None,
) -> rd.Dataset:
    """Generic LSH dup-finder.  ``bucket_rows`` has (key_col, id_col,
    payload...).  Rows sharing a key are candidates; ``verify(group_tbl,
    rep_idx, member_idx) -> bool mask`` confirms near-duplicates against
    the group representative (min id).  Returns a Dataset of distinct
    dup ids (column ``id_col``) — always excluding representatives, so
    one survivor remains per confirmed group."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "__bucket", pa.array(_crc_bucket_i64(keys, num_buckets), pa.int32())
        )

    def find_dups(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["__bucket"]).sort_by(
            [(key_col, "ascending"), (id_col, "ascending")]
        )
        n = t.num_rows
        if n == 0:
            return pa.table({id_col: pa.array([], t.column(id_col).type)})
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        new_grp = np.r_[True, keys[1:] != keys[:-1]]
        grp_id = np.cumsum(new_grp) - 1
        rep_idx = np.flatnonzero(new_grp)  # first (min-id) row per key group
        member_idx = np.flatnonzero(~new_grp)
        if len(member_idx) == 0:
            return pa.table({id_col: pa.array([], t.column(id_col).type)})
        rep_of_member = rep_idx[grp_id[member_idx]]
        ok = verify(t, rep_of_member, member_idx)
        dup_rows = member_idx[ok]
        return pa.table({id_col: _single_chunk(t.column(id_col)).take(pa.array(dup_rows, pa.int64()))})

    dups = (
        bucket_rows.map_batches(add_bucket, batch_format="pyarrow")
        .repartition(min(num_buckets, 32))
        .groupby("__bucket", num_partitions=min(num_buckets, 32))
        .map_groups(find_dups, batch_format="pyarrow")
    )
    # An id can be flagged by several bands/blocks — dedupe the dup list.
    deduped = keep_min_by(dups.map_batches(
        lambda b: b.append_column("__one", pa.array(np.zeros(b.num_rows, np.int8))),
        batch_format="pyarrow",
    ), id_col, "__one").drop_columns(["__one"])
    if id_type is not None:
        # Empty groupby partitions emit 0-row blocks with an EMPTY
        # schema, which breaks the downstream anti-join ("no match for
        # FieldRef").  Normalize every block to the typed id schema and
        # union a typed seed block so even an all-empty dataset joins.
        def normalize(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or id_col not in b.column_names:
                return pa.table({id_col: pa.array([], id_type)})
            return b.select([id_col])

        seed = rd.from_arrow(pa.table({id_col: pa.array([], id_type)}))
        deduped = seed.union(deduped.map_batches(normalize, batch_format="pyarrow"))
    return deduped


def anti_join_ids(
    ds: rd.Dataset,
    dup_ids: rd.Dataset,
    id_col: str,
    strategy: str = "broadcast",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Drop corpus rows whose id appears in ``dup_ids``.

    ``Dataset.join(join_type="left_anti")`` is unusable here: Ray
    2.49's hash-join aggregator builds schema-less empty tables for
    partitions that receive no right-side rows, and pyarrow then fails
    with "No match for FieldRef" — any sparse dup set crashes.  Two
    strategies of our own instead:

    - ``broadcast`` (default): stream the dup-id column to the driver
      (compact Arrow array — ids only, never payloads), ``ray.put`` it
      once, and filter every batch with a vectorized ``is_in``.  No
      corpus shuffle at all.  Right choice while the dup-id set fits in
      memory (billions of int64 ids = GBs) — i.e. almost always.
    - ``shuffle``: for dup sets too large to broadcast — null-pad the
      dup ids to the corpus schema, union, hash-bucket by id, and filter
      inside each bucket group.  One corpus-wide shuffle, same movement
      a hash join would cost, but robust to empty partitions.
    """
    import ray

    if strategy == "broadcast":
        chunks = []
        for b in dup_ids.iter_batches(batch_format="pyarrow", batch_size=65536):
            if id_col in b.column_names and b.num_rows:
                chunks.append(_single_chunk(b.column(id_col)))
        dup_arr = (
            pa.concat_arrays(chunks)
            if chunks
            else pa.array([], ds.schema().base_schema.field(id_col).type)
        )
        if len(dup_arr) == 0:
            return ds
        ref = ray.put(dup_arr)

        def filt(batch: pa.Table) -> pa.Table:
            dup = ray.get(ref)
            mask = pc.invert(pc.is_in(batch.column(id_col), value_set=dup))
            return batch.filter(mask)

        return ds.map_batches(filt, batch_format="pyarrow")

    if strategy != "shuffle":
        raise ValueError(f"unknown anti-join strategy {strategy!r}")

    schema = ds.schema().base_schema

    def tag_left(b: pa.Table) -> pa.Table:
        return b.append_column("__dup", pa.array(np.zeros(b.num_rows, np.int8)))

    def pad_right(b: pa.Table) -> pa.Table:
        n = b.num_rows if id_col in b.column_names else 0
        cols = {}
        for f in schema:
            if f.name == id_col and n:
                cols[f.name] = pc.cast(_single_chunk(b.column(id_col)), f.type)
            else:
                cols[f.name] = pa.nulls(n, f.type)
        t = pa.table(cols)
        return t.append_column("__dup", pa.array(np.ones(n, np.int8)))

    both = ds.map_batches(tag_left, batch_format="pyarrow").union(
        dup_ids.map_batches(pad_right, batch_format="pyarrow")
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = batch.column(id_col)
        if pa.types.is_integer(keys.type):
            bk = _crc_bucket_i64(
                keys.to_numpy(zero_copy_only=False).astype(np.int64), num_buckets
            )
        else:
            bk = np.array(
                [zlib.crc32(str(v).encode()) % num_buckets for v in keys.to_pylist()],
                dtype=np.int32,
            )
        return batch.append_column("__bucket", pa.array(bk, pa.int32()))

    def filter_group(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["__bucket"])
        is_dup = pc.equal(t.column("__dup"), 1)
        dup_set = t.filter(is_dup).column(id_col)
        keep = t.filter(pc.invert(is_dup))
        if len(dup_set):
            keep = keep.filter(
                pc.invert(
                    pc.is_in(keep.column(id_col), value_set=_single_chunk(dup_set))
                )
            )
        return keep.drop_columns(["__dup"])

    return (
        both.map_batches(add_bucket, batch_format="pyarrow")
        .repartition(min(num_buckets, 32))
        .groupby("__bucket", num_partitions=min(num_buckets, 32))
        .map_groups(filter_group, batch_format="pyarrow")
    )


def _sig_matrix(t: pa.Table, col: str) -> np.ndarray:
    arr = _single_chunk(t.column(col))
    k = arr.type.list_size
    return np.asarray(arr.values).reshape(-1, k)




def candidate_pairs_from_buckets(
    bucket_rows: rd.Dataset,
    key_col: str,
    id_col: str,
    verify,
    num_buckets: int = 64,
) -> rd.Dataset:
    """(member_id, rep_id) candidate pairs: rows sharing ``key_col``
    within a bucket, screened by ``verify`` against the group's min-id
    representative.  Shared machinery for pair-based clustering
    (ngram exact verify, connected components)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "__bucket", pa.array(_crc_bucket_i64(keys, num_buckets), pa.int32())
        )

    def pairs_of(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["__bucket"]).sort_by(
            [(key_col, "ascending"), (id_col, "ascending")]
        )
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        empty = pa.table(
            {id_col: pa.array([], t.column(id_col).type),
             "rep_id": pa.array([], t.column(id_col).type)}
        )
        if len(keys) == 0:
            return empty
        new_grp = np.r_[True, keys[1:] != keys[:-1]]
        grp_id = np.cumsum(new_grp) - 1
        rep_idx = np.flatnonzero(new_grp)
        member_idx = np.flatnonzero(~new_grp)
        if len(member_idx) == 0:
            return empty
        rep_of = rep_idx[grp_id[member_idx]]
        ok = verify(t, rep_of, member_idx)
        ids = _single_chunk(t.column(id_col))
        return pa.table(
            {
                id_col: ids.take(pa.array(member_idx[ok], pa.int64())),
                "rep_id": ids.take(pa.array(rep_of[ok], pa.int64())),
            }
        )

    return (
        bucket_rows.map_batches(add_bucket, batch_format="pyarrow")
        .repartition(min(num_buckets, 32))
        .groupby("__bucket", num_partitions=min(num_buckets, 32))
        .map_groups(pairs_of, batch_format="pyarrow")
    )


def cluster_components(pairs: rd.Dataset, id_col: str, id_type: pa.DataType) -> rd.Dataset:
    """Union-find over candidate pairs -> dup ids (everything except the
    min id of each connected component).  Transitive chains A~B~C
    collapse to ONE survivor even when A and C never share a bucket.

    Driver-side: the pair list is bounded by the near-dup rate (tiny
    relative to the corpus).  For pair sets beyond driver memory,
    replace with iterative min-label propagation over the pairs table
    (each round: groupby id -> min(label); converges in O(log diameter)
    rounds) — same output contract."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            # Deterministic: smaller id becomes the root.
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo

    for b in pairs.iter_batches(batch_format="pyarrow", batch_size=65536):
        if b.num_rows == 0 or id_col not in b.column_names:
            continue
        for a_, r_ in zip(b[id_col].to_pylist(), b["rep_id"].to_pylist()):
            parent.setdefault(a_, a_)
            parent.setdefault(r_, r_)
            union(a_, r_)
    dups = [x for x in parent if find(x) != x]
    return rd.from_arrow(pa.table({id_col: pa.array(sorted(dups), id_type)}))


def minhash_band_rows(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> rd.Dataset:
    """(id, band_key, sig) rows — ``bands`` rows per input row.  Only
    ids + sketches leave the map stage; text stays columnar-pruned out."""
    rows_per_band = k // bands

    def sketch(batch: pa.Table) -> pa.Table:
        texts = _single_chunk(batch.column(text_col))
        sh, par, n = shingle_hashes(texts, n=shingle_n)
        sig = minhash_signatures(sh, par, n, k=k)
        # Rows with zero shingles (empty/whitespace-only docs) all share
        # the sentinel signature — they must never become candidates
        # (near-dup semantics; exact_dedup handles identical empties).
        present = np.zeros(n, dtype=bool)
        if len(par):
            present[np.unique(par)] = True
        sig = sig[present]
        n = int(present.sum())
        keys = lsh_band_keys(sig, bands, rows_per_band)  # (n, bands)
        ids = pc.take(batch.column(id_col), pa.array(np.flatnonzero(present), pa.int64()))
        out_ids = pc.take(ids, pa.array(np.repeat(np.arange(n), bands), pa.int64()))
        sig32 = (sig & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        sig_rep = np.repeat(sig32, bands, axis=0)
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sig_rep.ravel(), pa.uint32()), k
        )
        return pa.table(
            {
                id_col: _single_chunk(out_ids),
                "band_key": pa.array(keys.ravel(), pa.int64()),
                "sig": sig_col,
            }
        )

    return ds.map_batches(sketch, batch_format="pyarrow")


def minhash_lsh_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    num_buckets: int = 64,
    join_partitions: int = 16,  # kept for API compat; no longer used
    anti_strategy: str = "broadcast",
    cluster: str = "bucket",  # "bucket" | "components"
) -> rd.Dataset:
    """MinHash+LSH near-dup removal: keep one survivor (min id) per
    group of docs whose estimated shingle-Jaccard ≥ ``threshold``.

    ``cluster="bucket"`` (default) drops non-representative members per
    band-bucket group — fast, but a transitive chain A~B~C whose ends
    never share a band can keep both A and C.  ``cluster="components"``
    builds verified candidate pairs and collapses each CONNECTED
    COMPONENT to its min id (cluster_components)."""
    band_rows = minhash_band_rows(ds, text_col, id_col, k, bands, shingle_n)

    def verify(t: pa.Table, rep_idx: np.ndarray, member_idx: np.ndarray) -> np.ndarray:
        sig = _sig_matrix(t, "sig")
        return signature_jaccard(sig[member_idx], sig[rep_idx]) >= threshold

    id_type = ds.schema().base_schema.field(id_col).type
    if cluster == "components":
        pairs = candidate_pairs_from_buckets(
            band_rows, "band_key", id_col, verify, num_buckets
        )
        dup_ids = cluster_components(pairs, id_col, id_type)
    else:
        dup_ids = _dup_ids_from_buckets(
            band_rows, "band_key", id_col, verify, num_buckets, id_type=id_type
        )
    return anti_join_ids(ds, dup_ids, id_col, strategy=anti_strategy)


def simhash_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    num_buckets: int = 64,
    join_partitions: int = 16,  # kept for API compat; no longer used
    anti_strategy: str = "broadcast",
) -> rd.Dataset:
    """SimHash near-dup removal: 4-block pigeonhole candidates (complete
    for hamming ≤ 3), verified by exact hamming distance."""
    n_blocks = 4

    def sketch(batch: pa.Table) -> pa.Table:
        texts = _single_chunk(batch.column(text_col))
        # Tokenize ONCE (token hashing dominates sketch cost): signature
        # and presence mask both derive from the same token stream.
        from ..functions.sketch import simhash_from_tokens, token_hashes

        th, tpar, tn = token_hashes(texts)
        sig = simhash_from_tokens(th, tpar, tn)
        # Token-less docs share the all-zero signature — exclude them
        # from candidacy (same rationale as the MinHash sentinel rows).
        present = np.zeros(tn, dtype=bool)
        if len(tpar):
            present[np.unique(tpar)] = True
        sig = sig[present]
        n = len(sig)
        blocks = simhash_blocks(sig, n_blocks)  # (n, 4)
        # Namespace each block position so block i only matches block i.
        keyed = blocks + (np.arange(n_blocks, dtype=np.int64) << 48)[None, :]
        pres_ids = pc.take(
            batch.column(id_col), pa.array(np.flatnonzero(present), pa.int64())
        )
        ids = pc.take(
            pres_ids, pa.array(np.repeat(np.arange(n), n_blocks), pa.int64())
        )
        return pa.table(
            {
                id_col: _single_chunk(ids),
                "block_key": pa.array(keyed.ravel(), pa.int64()),
                "sim": pa.array(np.repeat(sig.view(np.int64), n_blocks), pa.int64()),
            }
        )

    rows = ds.map_batches(sketch, batch_format="pyarrow")

    def verify(t: pa.Table, rep_idx: np.ndarray, member_idx: np.ndarray) -> np.ndarray:
        sim = t.column("sim").to_numpy(zero_copy_only=False).view(np.uint64)
        return hamming_distance(sim[member_idx], sim[rep_idx]) <= max_hamming

    id_type = ds.schema().base_schema.field(id_col).type
    dup_ids = _dup_ids_from_buckets(
        rows, "block_key", id_col, verify, num_buckets, id_type=id_type
    )
    return anti_join_ids(ds, dup_ids, id_col, strategy=anti_strategy)


def ngram_jaccard_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_n: int = 3,
    num_buckets: int = 64,
    join_partitions: int = 16,  # kept for API compat; no longer used
    anti_strategy: str = "broadcast",
) -> rd.Dataset:
    """EXACT word n-gram Jaccard dedup.  Candidates come from MinHash
    LSH (cheap, sketch-only shuffle); verification joins the candidate
    PAIRS — a tiny dataset — back to the corpus text twice and computes
    the exact shingle-set Jaccard per pair.  Only confirmed ids are
    dropped (min-id survivor per pair group)."""
    band_rows = minhash_band_rows(ds, text_col, id_col, k=64, bands=16, shingle_n=shingle_n)

    # Candidate pairs (member, rep) with a permissive signature screen at
    # half the final threshold — exactness comes from the verify step.
    screen = threshold * 0.5

    def verify(t: pa.Table, rep_idx: np.ndarray, member_idx: np.ndarray) -> np.ndarray:
        sig = _sig_matrix(t, "sig")
        return signature_jaccard(sig[member_idx], sig[rep_idx]) >= screen

    def pairs_from_buckets(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["__bucket"]).sort_by(
            [("band_key", "ascending"), (id_col, "ascending")]
        )
        keys = t.column("band_key").to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            return pa.table(
                {id_col: pa.array([], t.column(id_col).type),
                 "rep_id": pa.array([], t.column(id_col).type)}
            )
        new_grp = np.r_[True, keys[1:] != keys[:-1]]
        grp_id = np.cumsum(new_grp) - 1
        rep_idx = np.flatnonzero(new_grp)
        member_idx = np.flatnonzero(~new_grp)
        if len(member_idx) == 0:
            return pa.table(
                {id_col: pa.array([], t.column(id_col).type),
                 "rep_id": pa.array([], t.column(id_col).type)}
            )
        rep_of = rep_idx[grp_id[member_idx]]
        ok = verify(t, rep_of, member_idx)
        ids = _single_chunk(t.column(id_col))
        return pa.table(
            {
                id_col: ids.take(pa.array(member_idx[ok], pa.int64())),
                "rep_id": ids.take(pa.array(rep_of[ok], pa.int64())),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = batch.column("band_key").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "__bucket", pa.array(_crc_bucket_i64(keys, num_buckets), pa.int32())
        )

    pairs = (
        band_rows.map_batches(add_bucket, batch_format="pyarrow")
        .repartition(min(num_buckets, 32))
        .groupby("__bucket", num_partitions=min(num_buckets, 32))
        .map_groups(pairs_from_buckets, batch_format="pyarrow")
    )
    pairs = keep_min_by(pairs, id_col, "rep_id")  # one rep per member id

    # Resolve candidate texts WITHOUT Dataset.join (broken for sparse
    # sides in Ray 2.49 — see anti_join_ids): candidate pairs are few by
    # construction (LSH screen), so collect the pair list, broadcast an
    # id -> text dict for only the involved ids (ray.put once), and
    # verify pairs distributedly with the dict lookup.
    import ray

    pair_chunks = [
        b
        for b in pairs.iter_batches(batch_format="pyarrow", batch_size=65536)
        if b.num_rows and id_col in b.column_names
    ]
    if not pair_chunks:
        return ds
    pairs_tbl = pa.concat_tables(pair_chunks)
    id_type = ds.schema().base_schema.field(id_col).type
    involved = pa.concat_arrays(
        [
            pc.cast(_single_chunk(pairs_tbl.column(id_col)), id_type),
            pc.cast(_single_chunk(pairs_tbl.column("rep_id")), id_type),
        ]
    ).unique()
    inv_ref = ray.put(involved)

    def pick_texts(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b.column(id_col), value_set=ray.get(inv_ref))
        return b.filter(mask).select([id_col, text_col])

    id_to_text: dict = {}
    for b in ds.map_batches(pick_texts, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=65536
    ):
        id_to_text.update(zip(b[id_col].to_pylist(), b[text_col].to_pylist()))
    text_ref = ray.put(id_to_text)

    def exact_jaccard(batch: pa.Table) -> pa.Table:
        lut = ray.get(text_ref)
        a_ids = batch.column(id_col).to_pylist()
        b_ids = batch.column("rep_id").to_pylist()
        text_a = pa.array([lut.get(i, "") for i in a_ids], pa.string())
        text_b = pa.array([lut.get(i, "") for i in b_ids], pa.string())
        ha, pa_a, n = shingle_hashes(text_a, shingle_n)
        hb, pa_b, _ = shingle_hashes(text_b, shingle_n)
        jac = np.zeros(n)
        for i in range(n):  # candidate pairs are few; set ops per pair
            sa = set(ha[pa_a == i].tolist())
            sb = set(hb[pa_b == i].tolist())
            denom = len(sa | sb)
            # Two shingle-less docs are NOT near-dups (exact dedup owns
            # identical empties).
            jac[i] = (len(sa & sb) / denom) if denom else 0.0
        keep = pa.array(jac >= threshold)
        return batch.filter(keep).select([id_col])

    dup_ids = rd.from_arrow(pairs_tbl).map_batches(
        exact_jaccard, batch_format="pyarrow"
    )
    return anti_join_ids(ds, dup_ids, id_col, strategy=anti_strategy)


def embedding_neardup(
    ds: rd.Dataset,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    planes: int = 16,
    seed: int = 11,
    num_buckets: int = 64,
    join_partitions: int = 16,  # kept for API compat; no longer used
    anti_strategy: str = "broadcast",
) -> rd.Dataset:
    """Embedding-cosine near-dup removal: random-hyperplane sign-LSH
    buckets (``planes`` bits), exact cosine verify vs the bucket
    representative.  The hyperplane matrix is seeded and rebuilt in
    every task (tiny) — no state to ship."""

    def sketch(batch: pa.Table) -> pa.Table:
        emb = _single_chunk(batch.column(emb_col))
        n = len(emb)
        dim = len(emb[0]) if n else 0
        mat = np.asarray(emb.values, dtype=np.float64).reshape(n, dim) if n else np.zeros((0, 0))
        rng = np.random.default_rng(seed)
        planes_m = rng.standard_normal((dim, planes)) if dim else np.zeros((0, planes))
        bits = (mat @ planes_m > 0).astype(np.uint64)
        key = (bits << np.arange(planes, dtype=np.uint64)[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        norms = np.linalg.norm(mat, axis=1)
        unit = mat / np.maximum(norms, 1e-12)[:, None]
        return pa.table(
            {
                id_col: _single_chunk(batch.column(id_col)),
                "plane_key": pa.array(key.view(np.int64), pa.int64()),
                "unit": pa.FixedSizeListArray.from_arrays(
                    pa.array(unit.ravel(), pa.float64()), dim
                ),
            }
        )

    rows = ds.map_batches(sketch, batch_format="pyarrow")

    def verify(t: pa.Table, rep_idx: np.ndarray, member_idx: np.ndarray) -> np.ndarray:
        unit = _single_chunk(t.column("unit"))
        dim = unit.type.list_size
        m = np.asarray(unit.values, dtype=np.float64).reshape(-1, dim)
        cos = (m[member_idx] * m[rep_idx]).sum(axis=1)
        return cos >= threshold

    dup_ids = _dup_ids_from_buckets(
        rows, "plane_key", id_col, verify, num_buckets,
        id_type=ds.schema().base_schema.field(id_col).type,
    )
    # anti_join_ids (not Dataset.join): nested list payloads and sparse
    # dup sets are both fine — broadcast is_in filter, no corpus shuffle.
    return anti_join_ids(ds, dup_ids, id_col, strategy=anti_strategy)
