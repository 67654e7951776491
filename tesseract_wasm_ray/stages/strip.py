"""Boilerplate-strip stage over text span rows.

Stateless ``map_batches`` transform (SURVEY.md §2.9): the regexes are
compiled once at module import in each worker process, so a plain
function (cheap elastic tasks) is the right compute strategy — there is
no per-actor state to amortize beyond module init.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.boilerplate import strip_boilerplate


def strip_text_spans(batch: pa.Table) -> pa.Table:
    """Replace the ``text`` column with stripped main content."""
    texts = batch.column("text").to_pylist()
    stripped = pa.array([strip_boilerplate(t or "") for t in texts], pa.string())
    i = batch.schema.get_field_index("text")
    return batch.set_column(i, "text", stripped)
