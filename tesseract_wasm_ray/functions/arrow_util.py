"""Shared Arrow helpers."""

from __future__ import annotations

import pyarrow as pa


def single_chunk(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Flatten a (possibly chunked) column to ONE contiguous Array —
    the precondition for zero-copy numpy views and offset arithmetic.
    Empty chunked columns yield a typed empty array."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0) if col.num_chunks else pa.array([], col.type)
    return col
