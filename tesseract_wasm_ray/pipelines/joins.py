"""Bucketed task-shuffle joins (no driver state, no aggregator actors).

Ray 2.49's ``Dataset.join`` hash-join aggregator crashes on sparse /
empty partitions (see dedup.anti_join_ids), and long-lived aggregator
actors compose badly with actor-pool stages on small CPU budgets.  The
engine therefore joins with its own primitive: union both sides tagged,
hash-bucket on a crc32-stable key, resolve per bucket group with
vectorized dictionary lookups.  Partitions are deterministic across
processes (crc32 / Fibonacci-mix bucketing), so re-runs and resumes see
identical groups.

``bucket_lookup_join`` is a LEFT lookup join: every left row comes back
exactly once, with ``out_col`` filled from the right side's ``value_col``
(null when the key has no right row; ties broken by minimum value so the
result is deterministic under duplicate right keys).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.arrow_util import single_chunk as _single_chunk


def _bucket_of_array(keys: pa.Array, num_buckets: int) -> np.ndarray:
    """Stable bucket ids for a key array (int: Fibonacci mix, str: crc32
    over the dictionary — one Python hash per DISTINCT key)."""
    if pa.types.is_integer(keys.type):
        k = keys.to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            mixed = (k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
        return (mixed % np.uint64(num_buckets)).astype(np.int32)
    enc = _single_chunk(pc.dictionary_encode(keys))
    lut = np.array(
        [zlib.crc32(str(v).encode()) % num_buckets for v in enc.dictionary.to_pylist()],
        dtype=np.int32,
    )
    codes = enc.indices.to_numpy(zero_copy_only=False)
    return lut[codes] if len(lut) else np.empty(0, np.int32)


def bucket_lookup_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_key: str,
    right_key: str,
    value_col: str,
    out_col: str,
    num_buckets: int = 64,
    num_partitions: int = 16,
    coalesce: int = 16,
    left_schema: pa.Schema | None = None,
    value_type: pa.DataType | None = None,
) -> rd.Dataset:
    """Fill ``out_col`` on every left row with the right side's
    ``value_col`` for the matching key (left outer; min value on
    duplicate right keys; null when unmatched).

    Movement: both sides shuffle ONCE on the key hash — no driver
    materialization of either side, no broadcast.  Right side should be
    pruned to (key, value) by the caller.

    ``left_schema`` / ``value_type`` override schema inference — needed
    when a side can be ALL-empty (Ray then has no schema to infer, e.g.
    a candidate-pair stream with zero candidates)."""
    if left_schema is None:
        left_schema = left.schema().base_schema
    key_type = left_schema.field(left_key).type
    if value_type is None:
        value_type = right.schema().base_schema.field(value_col).type
    left_names = left_schema.names

    def tag_left(b: pa.Table) -> pa.Table:
        k = pc.cast(_single_chunk(b.column(left_key)), key_type)
        bk = _bucket_of_array(k, num_buckets)
        return (
            b.append_column("__k", k)
            .append_column("__v", pa.nulls(b.num_rows, value_type))
            .append_column("__s", pa.array(np.zeros(b.num_rows, np.int8)))
            .append_column("__jb", pa.array(bk, pa.int32()))
        )

    def tag_right(b: pa.Table) -> pa.Table:
        k = pc.cast(_single_chunk(b.column(right_key)), key_type)
        bk = _bucket_of_array(k, num_buckets)
        cols = {name: pa.nulls(b.num_rows, left_schema.field(name).type) for name in left_names}
        t = pa.table(cols)
        return (
            t.append_column("__k", k)
            .append_column("__v", pc.cast(_single_chunk(b.column(value_col)), value_type))
            .append_column("__s", pa.array(np.ones(b.num_rows, np.int8)))
            .append_column("__jb", pa.array(bk, pa.int32()))
        )

    both = (
        left.map_batches(tag_left, batch_format="pyarrow")
        .union(right.map_batches(tag_right, batch_format="pyarrow"))
        .repartition(coalesce)
    )

    out_schema = pa.schema(
        [left_schema.field(n) for n in left_names] + [pa.field(out_col, value_type)]
    )

    def fill(group: pa.Table) -> pa.Table:
        if "__jb" not in group.column_names:
            # Empty groupby partitions emit 0-row blocks with an empty
            # schema (Ray 2.49 quirk) — normalize to the output schema.
            return out_schema.empty_table()
        t = group.drop_columns(["__jb"])
        side = t.column("__s").to_numpy(zero_copy_only=False)
        is_left = side == 0
        left_rows = t.filter(pa.array(is_left))
        if left_rows.num_rows == 0:
            return left_rows.drop_columns(["__k", "__v", "__s"]).rename_columns(
                left_names
            ).append_column(out_col, pa.array([], value_type))
        enc = _single_chunk(pc.dictionary_encode(t.column("__k")))
        codes = enc.indices.to_numpy(zero_copy_only=False)
        r_codes = codes[~is_left]
        vals_src = _single_chunk(t.column("__v")).filter(pa.array(~is_left))
        # Deterministic winner per key under duplicate right keys: the
        # MIN value.  Sort (code, value, position) with Arrow (value may
        # be any orderable type), then first row per code run wins.
        rt = pa.table(
            {
                "c": pa.array(r_codes, pa.int64()),
                "v": vals_src,
                "p": pa.array(np.arange(len(r_codes)), pa.int64()),
            }
        ).sort_by([("c", "ascending"), ("v", "ascending")])
        cs = rt.column("c").to_numpy(zero_copy_only=False)
        ps = rt.column("p").to_numpy(zero_copy_only=False)
        first = np.r_[True, cs[1:] != cs[:-1]] if len(cs) else np.empty(0, bool)
        lut = np.full(len(enc.dictionary), -1, np.int64)
        if len(cs):
            lut[cs[first]] = ps[first]
        l_codes = codes[is_left]
        hit = lut[l_codes] if len(lut) else np.full(len(l_codes), -1, np.int64)
        found = hit >= 0
        taken = vals_src.take(pa.array(np.where(found, hit, 0), pa.int64())) if len(
            vals_src
        ) else pa.nulls(len(l_codes), value_type)
        filled = pc.if_else(pa.array(found), taken, pa.nulls(len(l_codes), value_type))
        out = left_rows.drop_columns(["__k", "__v", "__s"])
        return out.append_column(out_col, filled)

    return both.groupby("__jb", num_partitions=num_partitions).map_groups(
        fill, batch_format="pyarrow"
    )


def bucket_semi_filter(
    ds: rd.Dataset,
    keys: rd.Dataset,
    key_col: str,
    num_buckets: int = 64,
    num_partitions: int = 16,
) -> rd.Dataset:
    """SEMI join as a filter: keep ``ds`` rows whose ``key_col`` value
    appears in ``keys`` (a Dataset carrying ``key_col``; duplicates
    fine).  Both sides shuffle ONCE on the key hash — payload rows move
    exactly once, the key side is sketch-sized — so this scales where a
    driver-collected broadcast set does not.  Null keys never match.
    Schema-robust to Ray 2.49's schema-less empty partitions."""
    schema = ds.schema().base_schema
    key_type = schema.field(key_col).type

    def tag_left(b: pa.Table) -> pa.Table:
        return b.append_column("__m", pa.array(np.zeros(b.num_rows, np.int8)))

    def pad_right(b: pa.Table) -> pa.Table:
        n = b.num_rows if key_col in b.column_names else 0
        cols = {}
        for f in schema:
            if f.name == key_col and n:
                cols[f.name] = pc.cast(_single_chunk(b.column(key_col)), f.type)
            else:
                cols[f.name] = pa.nulls(n, f.type)
        return pa.table(cols).append_column(
            "__m", pa.array(np.ones(n, np.int8))
        )

    both = ds.map_batches(tag_left, batch_format="pyarrow").union(
        keys.map_batches(pad_right, batch_format="pyarrow")
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        bk = _bucket_of_array(_single_chunk(b.column(key_col)), num_buckets)
        return b.append_column("__sb", pa.array(bk, pa.int32()))

    out_schema = schema

    def filter_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "__m" not in group.column_names:
            return out_schema.empty_table()
        t = group.drop_columns(["__sb"])
        is_key = pc.equal(t.column("__m"), 1)
        key_set = t.filter(is_key).column(key_col)
        left = t.filter(pc.invert(is_key))
        if len(key_set) == 0:
            return out_schema.empty_table()
        mask = pc.fill_null(
            pc.is_in(left.column(key_col), value_set=_single_chunk(key_set)), False
        )
        return left.filter(mask).drop_columns(["__m"])

    return (
        both.map_batches(add_bucket, batch_format="pyarrow")
        .repartition(min(num_partitions, 16))
        .groupby("__sb", num_partitions=num_partitions)
        .map_groups(filter_group, batch_format="pyarrow")
    )


def lookup_join_auto(
    left: rd.Dataset,
    right: rd.Dataset,
    left_key: str,
    right_key: str,
    value_col: str,
    out_col: str,
    broadcast_byte_cap: int = 256 << 20,
    **bucket_kwargs,
) -> rd.Dataset:
    """Size-adaptive LEFT lookup join (same semantics as
    bucket_lookup_join: left outer, MIN value on duplicate right keys,
    null when unmatched) — the caller never has to know the dim-table
    size up front:

    - stream the right side's (key, value) columns to the driver up to
      ``broadcast_byte_cap`` accumulated Arrow bytes; under the cap,
      ``ray.put`` one deduplicated lookup table and fill every left
      batch map-side with ``pc.index_in`` — NO shuffle of either side;
    - over the cap, fall back to the bucketed task-shuffle join (both
      sides move once).  The streamed prefix is discarded; the right
      side is dim-sized relative to the fact, so the re-execution is
      cheap next to the shuffle it gates.

    Mirrors dedup.anti_join_ids' auto strategy (same cap default)."""
    import ray

    proj = right.map_batches(
        lambda b: b.select([right_key, value_col]), batch_format="pyarrow"
    )
    tbls: list[pa.Table] = []
    total = 0
    too_big = False
    for b in proj.iter_batches(batch_format="pyarrow", batch_size=65536):
        if b.num_rows == 0:
            continue
        tbls.append(b)
        total += b.nbytes
        if total > broadcast_byte_cap:
            too_big = True
            break
    if too_big:
        return bucket_lookup_join(
            left, right, left_key, right_key, value_col, out_col, **bucket_kwargs
        )

    key_type = left.schema().base_schema.field(left_key).type
    if tbls:
        lut = pa.concat_tables(tbls)
        # drop null right keys BEFORE building the lookup: a null key
        # never matches under left-outer semantics (bucket_lookup_join
        # agrees), the run-dedup's equal() kernel would otherwise emit
        # null-masked booleans, and index_in would let a null left key
        # "match" a null right key
        lut = lut.filter(pc.is_valid(lut.column(right_key)))
        lut = lut.sort_by(
            [(right_key, "ascending"), (value_col, "ascending")]
        )
        keys = _single_chunk(pc.cast(lut.column(right_key), key_type))
        vals = _single_chunk(lut.column(value_col))
        if len(keys):
            # first row per key run == MIN value (sorted above)
            eq = pc.equal(keys.slice(1), keys.slice(0, len(keys) - 1))
            first = np.r_[True, np.invert(eq.to_numpy(zero_copy_only=False))]
            sel = pa.array(np.flatnonzero(first), pa.int64())
            keys, vals = keys.take(sel), vals.take(sel)
    else:
        keys = pa.array([], key_type)
        # a fully-empty right side can surface schema() == None (Ray
        # reports no schema when every block is empty); the lookup then
        # matches nothing, so any concrete value type works — int64
        schema = right.schema()
        vtype = (
            schema.base_schema.field(value_col).type
            if schema is not None
            else pa.int64()
        )
        vals = pa.array([], vtype)
    ref = ray.put((keys, vals))

    def fill(b: pa.Table) -> pa.Table:
        k, v = ray.get(ref)
        lk = pc.cast(_single_chunk(b.column(left_key)), key_type)
        idx = pc.index_in(lk, value_set=k)
        # take propagates null indices -> unmatched rows fill with null
        return b.append_column(out_col, v.take(idx))

    return left.map_batches(fill, batch_format="pyarrow")
