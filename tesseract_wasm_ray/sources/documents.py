"""Dataset sources for the interleaved corpus.

Parquet stands in for Lance in this sandbox (SURVEY.md §7.0): the Arrow
schema is identical, and these wrappers are the single place a
``read_lance`` call would slot in.  Column pruning is pushed to the read.
"""

from __future__ import annotations

import ray.data as rd


def _read_table(path: str, columns: list[str] | None) -> rd.Dataset:
    """Lance when available + requested (the north rule's storage), else
    parquet with the identical Arrow schema.  A ``.lance`` path uses
    ``ray.data.read_lance`` (fragment-level lineage maps 1:1 onto the
    manifest's per-bucket input ranges); this sandbox has no lance
    wheel, so parquet is the tested path."""
    if path.endswith(".lance"):
        try:
            return rd.read_lance(path, columns=columns)
        except (AttributeError, ImportError) as e:  # pragma: no cover
            raise RuntimeError(
                "lance reader requested but pylance is not installed"
            ) from e
    return rd.read_parquet(path, columns=columns)


def read_documents(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """documents table: (doc_id: string, spans: list<struct<...>>)."""
    return _read_table(path, columns)


def read_media(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """media table: (media_ref, width, height, channels, pixels, rotation).

    ``pixels`` rows are wide (raw rasters); callers should keep
    ``batch_size`` small on stages consuming this (SURVEY.md §4.2).
    """
    return _read_table(path, columns)
