"""Dataset sources for the interleaved corpus.

Parquet stands in for Lance in this sandbox (SURVEY.md §7.0): the Arrow
schema is identical, and these wrappers are the single place a
``read_lance`` call would slot in.  Column pruning is pushed to the read.
"""

from __future__ import annotations

import ray.data as rd


def read_documents(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """documents table: (doc_id: string, spans: list<struct<...>>)."""
    return rd.read_parquet(path, columns=columns)


def read_media(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """media table: (media_ref, width, height, channels, pixels, rotation).

    ``pixels`` rows are wide (raw rasters); callers should keep
    ``batch_size`` small on stages consuming this (SURVEY.md §4.2).
    """
    return rd.read_parquet(path, columns=columns)
