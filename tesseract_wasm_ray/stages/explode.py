"""Span explode: documents (doc_id, spans) -> flat span rows.

Fully vectorized Arrow kernels (list_flatten / list_parent_indices /
take) — zero Python per row.  The inverse of stages/reassemble.py.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..schema import SPAN_ROWS_SCHEMA


def explode_spans(batch: pa.Table) -> pa.Table:
    spans = batch.column("spans").combine_chunks()
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.chunk(0) if spans.num_chunks else pa.array([], spans.type)
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans)
    doc_id = pc.take(batch.column("doc_id"), parents)
    return pa.Table.from_arrays(
        [
            doc_id.combine_chunks() if isinstance(doc_id, pa.ChunkedArray) else doc_id,
            pc.struct_field(flat, "offset"),
            pc.struct_field(flat, "kind"),
            pc.struct_field(flat, "text"),
            pc.struct_field(flat, "media_ref"),
        ],
        schema=SPAN_ROWS_SCHEMA,
    )


def only_kind(kind: str):
    """Vectorized predicate stage: keep span rows of one kind."""

    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("kind"), kind))

    return fn
