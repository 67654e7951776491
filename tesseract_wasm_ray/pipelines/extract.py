"""The flagship extraction pipeline (SURVEY.md §3.5).

``config -> read documents -> explode spans -> [text branch: boilerplate
strip] ⊕ [media branch: OCR actor pool over the media table -> hash join
on media_ref] -> reassemble per doc_id -> validate / write + manifest``

Ray-Data-first shape:

- every stage is a ``map_batches`` over Arrow batches (zero-copy);
- the OCR stage is a fixed actor pool holding the warm glyph model
  (the reference's worker-per-engine model, SURVEY.md §2.3);
- recognition runs over the *media table* before any join, so pixel
  payloads never enter a shuffle — only (media_ref, text) pairs do;
- the media_ref join defaults to a bucketed task-shuffle join
  (see _join_media_text) — scale-correct for 10^12-row corpora and
  robust on any CPU budget; Dataset.join and broadcast remain
  selectable;
- reassembly is the single wide shuffle, on a crc32 doc_id bucket key
  (stages/reassemble.py), which doubles as the resume partition
  (stages/manifest.py).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import pyarrow as pa
import ray
import ray.data as rd

from .. import MODEL_VERSION
from ..schema import DOCUMENTS_SCHEMA
from ..sources import read_documents, read_media
from ..stages.explode import explode_spans, only_kind
from ..stages.manifest import (
    append_manifest,
    completed_buckets,
    config_fingerprint,
    write_bucket_atomic,
    write_quarantine_atomic,
)
from ..stages.ocr_actor import OcrActor
from ..stages.reassemble import add_bucket_column, stitch_bucket
from ..stages.strip import strip_text_spans
from ..state.glyph_model import GlyphModel


@dataclass
class ExtractConfig:
    ocr_concurrency: int = 8
    # Fractional reservation: the pool's logical claim is concurrency *
    # ocr_num_cpus, leaving scheduler headroom for the feeding read /
    # explode / strip tasks — a full-CPU pool starves its own input
    # (measured: actors idle 80% while upstream crawls on the leftover
    # cores).  The OS timeshares the real cores.
    ocr_num_cpus: float = 0.5
    ocr_batch_size: int = 256
    num_buckets: int = 64
    join_strategy: str = "bucket"  # "bucket" | "hash" | "broadcast"
    join_partitions: int = 32
    # Blocks entering a sort shuffle are coalesced to this many first:
    # hundreds of tiny blocks cost ~10ms of scheduling each in the sort
    # (sample+map+merge per block), dominating small-row shuffles.  Size
    # to ~0.5-1x the CPU count; raise with corpus size so blocks stay
    # under the worker heap (rows here are small text structs).
    coalesce_partitions: int = 16
    # Resume: media pages of completed buckets are pruned BEFORE the OCR
    # pool via a broadcast set of still-needed media_refs, bounded by
    # this cap (a near-complete resume has few refs).  An early-crash
    # resume exceeding the cap switches to a bucketed SEMI join of the
    # media table against the needed-ref stream — same pruning, one
    # extra shuffle of the (not-yet-OCR'd) media payloads, no driver
    # set, no re-OCR of completed buckets.
    max_resume_refs: int = 5_000_000
    emit_boxes: bool = False
    # Dead-letter policy for the OCR pool: "quarantine" (default — a
    # malformed payload poisons one row, lands in the bucket's
    # quarantine file, and the 100-TB run keeps going) or "raise" (the
    # strict CI mode: stop on the first corrupt page).
    on_error: str = "quarantine"
    model_blob: bytes = field(default_factory=lambda: GlyphModel.build().to_bytes(), repr=False)

    def fingerprint_dict(self) -> dict:
        return {
            "model_version": MODEL_VERSION,
            "num_buckets": self.num_buckets,
        }


def ocr_media(
    media_path: str,
    cfg: ExtractConfig,
    emit_boxes: bool | None = None,
    ref_filter=None,
    ref_filter_ds: rd.Dataset | None = None,
) -> rd.Dataset:
    """media table -> per-page OCR results (actor-pool stage).

    ``ref_filter``: optional ``ray.ObjectRef`` of a pa.Array of
    media_refs still needed (resume pruning) — rows outside it never
    reach the recognition pool.  ``ref_filter_ds``: the same pruning as
    a DATASET of needed refs, applied via a bucketed semi join (one
    shuffle of the media table) — the scale path when the ref set is
    too large to broadcast."""
    media = read_media(media_path)
    if ref_filter is not None:
        import pyarrow.compute as _pc

        def keep_needed(b: pa.Table) -> pa.Table:
            return b.filter(
                _pc.is_in(b.column("media_ref"), value_set=ray.get(ref_filter))
            )

        media = media.map_batches(keep_needed, batch_format="pyarrow")
    elif ref_filter_ds is not None:
        from .joins import bucket_semi_filter

        media = bucket_semi_filter(
            media, ref_filter_ds, "media_ref",
            num_buckets=cfg.join_partitions * 4,
            num_partitions=cfg.join_partitions,
        )
    return media.map_batches(
        OcrActor,
        fn_constructor_kwargs={
            "model_blob": cfg.model_blob,
            "emit_boxes": cfg.emit_boxes if emit_boxes is None else emit_boxes,
            "on_error": cfg.on_error,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.ocr_batch_size,
        concurrency=cfg.ocr_concurrency,
        num_cpus=cfg.ocr_num_cpus,
    )


def _join_media_text(media_rows: rd.Dataset, ocr_text: rd.Dataset, cfg: ExtractConfig) -> rd.Dataset:
    """(doc_id, offset, kind, media_ref) ⋈ (media_ref, rec_text) -> span rows
    with recognized text.  Only the legacy two-branch strategies live
    here — the default "bucket" strategy is the single-pass union join
    inside ``_span_rows`` (this function is only reached for
    ``join_strategy in {"hash", "broadcast"}``).

    - ``hash``: Ray ``Dataset.join`` (kept for comparison/benchmarks).
    - ``broadcast``: ship the (ref, text) columns via ``ray.put`` — no
      shuffle; right only when the media side fits the object store.
    """
    if cfg.join_strategy == "broadcast":
        # Small media side: ship the ref/text COLUMNS through the object
        # store once (ray.put), resolve per batch with a vectorized
        # index_in + take (no Python dict or per-row loop).
        import pyarrow.compute as pc

        chunks = [
            b.select(["media_ref", "rec_text"])
            for b in ocr_text.iter_batches(batch_format="pyarrow", batch_size=65536)
            if b.num_rows
        ]
        lut = (
            pa.concat_tables(chunks)
            if chunks
            else pa.table({"media_ref": pa.array([], pa.string()),
                           "rec_text": pa.array([], pa.string())})
        )
        lookup_ref = ray.put(
            (lut.column("media_ref").combine_chunks(), lut.column("rec_text").combine_chunks())
        )

        def lookup(batch: pa.Table) -> pa.Table:
            keys, vals = ray.get(lookup_ref)
            pos = pc.index_in(batch.column("media_ref"), value_set=keys)
            found = pc.fill_null(pc.cast(pos, pa.int64()), -1).to_numpy(zero_copy_only=False)
            import numpy as np

            taken = vals.take(pa.array(np.maximum(found, 0), pa.int64())) if len(vals) else None
            texts = (
                pc.if_else(pa.array(found >= 0), taken, pa.scalar("", pa.string()))
                if taken is not None
                else pa.array([""] * batch.num_rows, pa.string())
            )
            i = batch.schema.get_field_index("text")
            return batch.set_column(i, "text", texts)

        return media_rows.map_batches(lookup, batch_format="pyarrow")

    # Aggregator actors default to 1 whole CPU each; fractional
    # reservations keep a small-CPU session (tests, laptops) from
    # starving the map stages while still scaling out on big nodes.
    joined = media_rows.join(
        ocr_text,
        join_type="inner",
        num_partitions=cfg.join_partitions,
        on=("media_ref",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )

    def finish(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("text")
        batch = batch.set_column(i, "text", batch.column("rec_text"))
        return batch.drop_columns(["rec_text"])

    return joined.map_batches(finish, batch_format="pyarrow")


def _span_rows(
    docs_path: str,
    media_path: str,
    cfg: ExtractConfig,
    skip_buckets: frozenset[int] = frozenset(),
) -> rd.Dataset:
    """Single-pass span stream (docs are read + exploded exactly ONCE).

    ``explode -> strip(text spans inline)`` produces one stream of span
    rows; OCR results are padded to the same schema (kind="__ocr") and
    unioned in; ONE bucket-groupby both resolves media text (media /
    __ocr rows are co-bucketed by crc32(media_ref)) and passes text rows
    through (spread by crc32(doc_id) so no bucket hotspots).  Branching
    the explode into two consumers would duplicate the whole
    read+explode subplan in Ray's plan (measured: 2x the docs scan).
    """
    import zlib

    import numpy as np
    import pyarrow.compute as pc

    num_buckets = cfg.join_partitions * 4

    def prune_done(rows: pa.Table) -> pa.Table:
        """Drop span rows of docs whose reassembly bucket is already in
        the manifest — BEFORE stripping/shuffling (resume skips the
        expensive work, not just the final write)."""
        if not skip_buckets:
            return rows
        from ..functions.arrow_util import single_chunk

        enc = single_chunk(pc.dictionary_encode(rows.column("doc_id").combine_chunks()))
        keep_lut = np.array(
            [
                zlib.crc32(v.encode()) % cfg.num_buckets not in skip_buckets
                for v in enc.dictionary.to_pylist()
            ],
            dtype=bool,
        )
        codes = enc.indices.to_numpy(zero_copy_only=False)
        keep = keep_lut[codes] if len(keep_lut) else np.empty(0, dtype=bool)
        return rows.filter(pa.array(keep))

    def explode_and_strip(batch: pa.Table) -> pa.Table:
        rows = prune_done(explode_spans(batch))
        kind = rows.column("kind")
        is_text = pc.equal(kind, "text").to_numpy(zero_copy_only=False)
        from ..functions.boilerplate import strip_boilerplate

        # Slice to TEXT rows before the (inherently Python) stripper:
        # media placeholder rows never cross the Arrow->Python boundary,
        # and the scatter-back is one replace_with_mask kernel.
        text_col = pc.fill_null(rows.column("text").combine_chunks(), "")
        idx = np.flatnonzero(is_text)
        if len(idx):
            sliced = text_col.take(pa.array(idx, pa.int64())).to_pylist()
            repl = pa.array([strip_boilerplate(t) for t in sliced], pa.string())
            text_col = pc.replace_with_mask(text_col, pa.array(is_text), repl)
        i = rows.schema.get_field_index("text")
        rows = rows.set_column(i, "text", text_col)
        # Bucket: media rows by media_ref (co-locate with __ocr rows),
        # text rows by doc_id (even spread; they only pass through).
        # crc32 runs once per DISTINCT key (dictionary-encoded): doc_ids
        # repeat once per span, so this is ~8x fewer Python hash calls.
        from ..functions.arrow_util import single_chunk

        keys = pc.if_else(
            pa.array(is_text), rows.column("doc_id"), rows.column("media_ref")
        )
        enc = single_chunk(pc.dictionary_encode(keys.combine_chunks()))
        lut = np.array(
            [zlib.crc32(str(v).encode()) % num_buckets for v in enc.dictionary.to_pylist()],
            dtype=np.int32,
        )
        codes = enc.indices.to_numpy(zero_copy_only=False)
        bk = lut[codes] if len(lut) else np.empty(0, np.int32)
        # dead-letter column: spans start clean; OCR failures arrive via
        # the co-bucketed __ocr rows (pad_ocr) and gather in fill_text
        rows = rows.append_column("error", pa.nulls(rows.num_rows, pa.string()))
        return rows.append_column("__jb", pa.array(bk, pa.int32()))

    def pad_ocr(batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        bk = np.fromiter(
            (zlib.crc32(r.encode()) % num_buckets for r in refs),
            dtype=np.int32,
            count=len(refs),
        )
        return pa.table(
            {
                "doc_id": pa.array([""] * batch.num_rows, pa.string()),
                "offset": pa.array(np.full(batch.num_rows, -1, np.int32), pa.int32()),
                "kind": pa.array(["__ocr"] * batch.num_rows, pa.string()),
                "text": batch.column("text").combine_chunks(),
                "media_ref": batch.column("media_ref").combine_chunks(),
                "error": batch.column("error").combine_chunks(),
                "__jb": pa.array(bk, pa.int32()),
            }
        )

    def fill_text(group: pa.Table) -> pa.Table:
        """Resolve media-span text from co-bucketed __ocr rows with a
        pure-Arrow gather: per-row source indices computed in numpy from
        dictionary codes, then ONE ``take`` on the text column — no
        ``to_pylist`` / Python-string materialization on the hot path
        (media spans start with text "", so an unmatched media row
        gathering its own text yields "" — the join's null fill)."""
        t = group.drop_columns(["__jb"])
        kind = t.column("kind")
        is_ocr = pc.equal(kind, "__ocr").combine_chunks()
        mask_ocr = is_ocr.to_numpy(zero_copy_only=False)
        mask_media = pc.equal(kind, "media_ref").to_numpy(zero_copy_only=False)
        if not mask_media.any():
            return t.filter(pc.invert(is_ocr))
        refs = pc.dictionary_encode(t.column("media_ref").combine_chunks())
        if isinstance(refs, pa.ChunkedArray):
            refs = refs.chunk(0) if refs.num_chunks else refs.combine_chunks()
        codes = refs.indices.to_numpy(zero_copy_only=False)
        idx_ocr = np.flatnonzero(mask_ocr)
        lut = np.full(len(refs.dictionary), -1, np.int64)
        lut[codes[idx_ocr]] = idx_ocr
        keep_idx = np.flatnonzero(~mask_ocr)
        src = lut[codes[keep_idx]]
        gather = np.where(mask_media[keep_idx] & (src >= 0), src, keep_idx)
        gather_arr = pa.array(gather, pa.int64())
        text_col = t.column("text").combine_chunks()
        filled = text_col.take(gather_arr)
        # the same gather routes the dead-letter column: a media span
        # whose __ocr row errored inherits that error string
        err_filled = t.column("error").combine_chunks().take(gather_arr)
        out = t.filter(pc.invert(is_ocr))
        i = out.schema.get_field_index("text")
        out = out.set_column(i, "text", filled)
        ie = out.schema.get_field_index("error")
        return out.set_column(ie, "error", err_filled)

    if cfg.join_strategy != "bucket":
        return _span_rows_two_branch(docs_path, media_path, cfg)

    docs = read_documents(docs_path)
    span_stream = docs.map_batches(
        explode_and_strip, batch_format="pyarrow", zero_copy_batch=True
    )

    ref_filter = None
    ref_filter_ds = None
    if skip_buckets:
        # Collect the still-needed media_refs (one lightweight pass over
        # the docs table — cheap next to the OCR it saves) and broadcast
        # them so completed buckets' pages never reach the pool.
        refs: set[str] = set()
        def probe_refs(b: pa.Table) -> pa.Table:
            rows = prune_done(explode_spans(b))
            return rows.filter(pc.equal(rows.column("kind"), "media_ref")).select(
                ["media_ref"]
            )

        probe = docs.map_batches(probe_refs, batch_format="pyarrow")
        too_many = False
        for b in probe.iter_batches(batch_format="pyarrow", batch_size=65536):
            refs.update(b["media_ref"].to_pylist())
            if len(refs) > cfg.max_resume_refs:
                too_many = True
                break
        if not too_many:
            ref_filter = ray.put(pa.array(sorted(refs), pa.string()))
        else:
            # Scale path (early-crash resume on a huge corpus): the
            # needed-ref set exceeds the broadcast cap, so prune via a
            # bucketed SEMI join — media payloads shuffle once against
            # the sketch-sized needed-ref stream instead of the whole
            # completed portion re-paying the OCR pool.  ``probe`` is a
            # lazy plan; re-executing it re-reads the (pruned) docs
            # table, which is cheap next to recognition.
            ref_filter_ds = probe

    ocr_rows = ocr_media(
        media_path, cfg, emit_boxes=False, ref_filter=ref_filter,
        ref_filter_ds=ref_filter_ds,
    ).map_batches(
        lambda b: pad_ocr(b.select(["media_ref", "text", "error"])),
        batch_format="pyarrow",
    )
    both = span_stream.union(ocr_rows).repartition(cfg.coalesce_partitions)
    return both.groupby("__jb", num_partitions=cfg.join_partitions).map_groups(
        fill_text, batch_format="pyarrow"
    )


def _span_rows_two_branch(docs_path: str, media_path: str, cfg: ExtractConfig) -> rd.Dataset:
    """Legacy two-branch shape for join_strategy in {"hash", "broadcast"}
    (_join_media_text).  Reads + explodes the docs twice (duplicated
    subplan) — kept for comparison benchmarks and as the broadcast path
    when the OCR-text side is known to fit the object store."""
    docs = read_documents(docs_path)
    spans = docs.map_batches(explode_spans, batch_format="pyarrow", zero_copy_batch=True)
    text_rows = spans.map_batches(only_kind("text"), batch_format="pyarrow").map_batches(
        strip_text_spans, batch_format="pyarrow"
    )
    media_rows = spans.map_batches(only_kind("media_ref"), batch_format="pyarrow")
    ocr_text = ocr_media(media_path, cfg, emit_boxes=False).map_batches(
        lambda b: b.select(["media_ref", "text"]).rename_columns(["media_ref", "rec_text"]),
        batch_format="pyarrow",
    )
    media_with_text = _join_media_text(media_rows, ocr_text, cfg)
    return text_rows.union(media_with_text)


def split_quarantine(t: pa.Table) -> tuple[pa.Table, pa.Table]:
    """Span rows -> (clean rows WITHOUT the error column, quarantined
    rows WITH it).  A document quarantines WHOLE when any of its spans
    errored: emitting the doc with a silently-empty media span would
    pass through looking healthy and break span-sequence equality
    downstream, which is exactly the failure mode the dead-letter path
    exists to make loud.  Tables with no error column (legacy
    hash/broadcast join strategies) pass through untouched."""
    from ..schema import QUARANTINE_SCHEMA

    import pyarrow.compute as pc

    empty_q = pa.Table.from_pylist([], schema=QUARANTINE_SCHEMA)
    if "error" not in t.column_names:
        return t, empty_q
    err = t.column("error")
    if err.null_count == len(err):
        return t.drop_columns(["error"]), empty_q
    bad_docs = pc.unique(
        t.filter(pc.is_valid(err)).column("doc_id").combine_chunks()
    )
    doc_bad = pc.is_in(t.column("doc_id"), value_set=bad_docs)
    quarantined = t.filter(doc_bad).select(
        ["doc_id", "offset", "kind", "text", "media_ref", "error"]
    ).cast(QUARANTINE_SCHEMA)
    clean = t.filter(pc.invert(doc_bad)).drop_columns(["error"])
    return clean, quarantined


def run_extract(
    docs_path: str,
    media_path: str,
    cfg: ExtractConfig | None = None,
    out_dir: str | None = None,
    resume: bool = True,
) -> rd.Dataset | list[dict]:
    """Run the flagship extraction.

    Without ``out_dir``: returns the reassembled documents Dataset
    (lazy; caller consumes it).

    With ``out_dir``: writes one parquet per bucket (atomic) + manifest
    rows with lineage and metrics; returns the new manifest rows.  With
    ``resume=True``, buckets already recorded in the manifest under the
    same config fingerprint are skipped *before* the shuffle.
    """
    cfg = cfg or ExtractConfig()
    done: set[int] = set()
    if out_dir is not None and resume:
        done = completed_buckets(out_dir, config_fingerprint(cfg.fingerprint_dict()))
    # _span_rows output is already coalesced (one block per fill
    # partition) — no repartition barrier needed before the reassembly.
    rows = _span_rows(docs_path, media_path, cfg, skip_buckets=frozenset(done))
    bucketed = rows.map_batches(add_bucket_column(cfg.num_buckets), batch_format="pyarrow")

    if out_dir is None:
        # lazy-return path: poisoned docs are dropped (the out_dir path
        # is where quarantine rows + manifest accounting live)
        return bucketed.groupby(
            "bucket", num_partitions=min(cfg.num_buckets, 64)
        ).map_groups(
            lambda g: stitch_bucket(split_quarantine(g.drop_columns(["bucket"]))[0]),
            batch_format="pyarrow",
        )

    import os

    os.makedirs(out_dir, exist_ok=True)
    fp = config_fingerprint(cfg.fingerprint_dict())
    if done:
        # Safety net on top of the upstream pruning (prune_done filters
        # at the explode; this catches any row that slipped through).
        import pyarrow.compute as pc

        skip = pa.array(sorted(done), pa.int32())
        bucketed = bucketed.map_batches(
            lambda b: b.filter(pc.invert(pc.is_in(b.column("bucket"), value_set=skip))),
            batch_format="pyarrow",
        )
    input_files = sorted(
        [docs_path, media_path]
    )  # at Lance scale: fragment ids / file lists per bucket

    def stitch_and_write(group: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        bucket = int(group.column("bucket")[0].as_py())
        clean, quarantined = split_quarantine(group.drop_columns(["bucket"]))
        qname = ""
        n_quar = 0
        if quarantined.num_rows:
            qname = write_quarantine_atomic(out_dir, bucket, quarantined)
            import pyarrow.compute as _pc

            n_quar = len(_pc.unique(quarantined.column("doc_id").combine_chunks()))
        table = stitch_bucket(clean)
        name = write_bucket_atomic(out_dir, bucket, table)
        # Manifest metrics via Arrow kernels: flatten the span structs
        # once, count non-whitespace runs per media span (identical to
        # ``len(text.split())``) — no nested Python loops on the write
        # path.
        import pyarrow.compute as pc

        flat = pc.list_flatten(table.column("spans").combine_chunks())
        n_spans = len(flat)
        media_texts = pc.struct_field(flat, "text").filter(
            pc.equal(pc.struct_field(flat, "kind"), "media_ref")
        )
        n_words = int(
            pc.sum(pc.count_substring_regex(media_texts, r"\S+")).as_py() or 0
        )
        row = {
            "partition_id": bucket,
            "config_fingerprint": fp,
            "model_version": MODEL_VERSION,
            "input_files": input_files,
            "n_docs": table.num_rows,
            "n_spans": int(n_spans),
            "n_words": int(n_words),
            "n_quarantined": n_quar,
            "quarantine_file": qname,
            "wall_ms": (time.monotonic() - t0) * 1000.0,
            "output_file": name,
        }
        from ..schema import MANIFEST_SCHEMA

        return pa.Table.from_pylist([row], schema=MANIFEST_SCHEMA)

    manifest_rows = (
        bucketed.groupby("bucket", num_partitions=min(cfg.num_buckets, 64))
        .map_groups(stitch_and_write, batch_format="pyarrow")
        .take_all()
    )  # manifest rows are tiny (one per bucket) — safe to materialize
    append_manifest(out_dir, manifest_rows)
    return manifest_rows


def _span_seq_hashes(side: str):
    """(doc_id, spans) -> (doc_id, side, seq_hash) where seq_hash is a
    canonical digest of the (kind, text, media_ref, order) sequence.

    Vectorized (VERDICT r03 item 8): the canonical per-doc string is
    built entirely with Arrow kernels — flatten the span lists, lexsort
    flat rows by (doc, offset) in numpy, render each span as
    ``kind\\x1ftext\\x1fmedia_ref\\x1e`` via binary_join_element_wise,
    and binary_join each doc's sorted records — so Python touches one
    string per DOCUMENT (the sha1 call), not four fields per span."""
    import hashlib

    import numpy as np
    import pyarrow.compute as pc

    from ..functions.arrow_util import single_chunk

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        spans = single_chunk(batch.column("spans").combine_chunks())
        flat = pc.list_flatten(spans)
        counts = pc.list_value_length(spans).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        parents = np.repeat(np.arange(n), counts)
        offs = pc.struct_field(flat, "offset").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.lexsort((offs, parents))
        # "None" fill mirrors the previous f-string rendering of nulls
        rec = pc.binary_join_element_wise(
            pc.fill_null(pc.struct_field(flat, "kind"), "None"),
            pc.fill_null(pc.struct_field(flat, "text"), "None"),
            pc.fill_null(pc.struct_field(flat, "media_ref"), "None"),
            "\x1f",
        )
        rec = pc.binary_join_element_wise(rec, "", "\x1e")  # trailing sep
        rec_sorted = pc.take(rec, pa.array(order, pa.int64()))
        offsets = pa.array(np.r_[0, np.cumsum(counts)], pa.int32())
        per_doc = pc.binary_join(
            pa.ListArray.from_arrays(offsets, rec_sorted), ""
        )
        hashes = [
            hashlib.sha1(s.encode()).hexdigest() for s in per_doc.to_pylist()
        ]
        return pa.table(
            {
                "doc_id": pa.array(batch.column("doc_id").to_pylist(), pa.string()),
                "side": pa.array([side] * n, pa.string()),
                "seq_hash": pa.array(hashes, pa.string()),
            }
        )

    return fn


def validate_against_golden(result: rd.Dataset, golden_path: str) -> dict:
    """Span-sequence equality gate: (kind, text, media_ref, order) per doc
    (BASELINE.json north_rule).  Returns counts; mismatches==0 is the gate.

    Implemented as a union + bucket-groupby compare over tiny
    (doc_id, seq_hash) rows — a task-based shuffle with no persistent
    aggregator actors, so it composes with actor-pool stages on any CPU
    budget and only digests (never span payloads) move in the shuffle.
    """
    golden = rd.read_parquet(golden_path)
    tagged = result.map_batches(_span_seq_hashes("r"), batch_format="pyarrow").union(
        golden.map_batches(_span_seq_hashes("g"), batch_format="pyarrow")
    )

    def compare(group: pa.Table) -> pa.Table:
        import pandas as pd

        df = group.to_pandas()
        piv = df.pivot_table(
            index="doc_id", columns="side", values="seq_hash", aggfunc="first"
        )
        r = piv["r"] if "r" in piv else pd.Series(index=piv.index, dtype=object)
        g = piv["g"] if "g" in piv else pd.Series(index=piv.index, dtype=object)
        missing = int(r.isna().sum() + g.isna().sum())
        both = r.notna() & g.notna()
        ok = int((r[both] == g[both]).sum())
        mismatch = int(both.sum()) - ok
        return pa.Table.from_pylist(
            [{"ok": ok, "mismatch": mismatch, "missing": missing}]
        )

    bucketed = tagged.repartition(16).map_batches(
        add_bucket_column(16), batch_format="pyarrow"
    )
    counts = (
        bucketed.groupby("bucket", num_partitions=16)
        .map_groups(compare, batch_format="pyarrow")
        .to_pandas()
        .sum()
    )
    return {
        "docs_ok": int(counts["ok"]),
        "docs_mismatched": int(counts["mismatch"]),
        "docs_missing": int(counts["missing"]),
    }
