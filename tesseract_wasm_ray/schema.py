"""Arrow schemas for the engine's tables (SURVEY.md §1.2).

The ``documents`` schema is the authoritative input shape from
BASELINE.json ``input_hint``:
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# Media table: raw rasterized pages, the stand-in for the reference's image
# files (ImageData {data,width,height}, /root/reference/src/ocr-engine.ts:179).
MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("pixels", pa.binary()),
        ("rotation", pa.int32()),  # applied rotation, ground truth for orientation
    ]
)

RECT_STRUCT = pa.struct(
    [
        ("left", pa.int32()),
        ("top", pa.int32()),
        ("right", pa.int32()),
        ("bottom", pa.int32()),
    ]
)

# TextItem (/root/reference/src/ocr-engine.ts:57-67).
TEXT_ITEM_STRUCT = pa.struct(
    [
        ("rect", RECT_STRUCT),
        ("flags", pa.int32()),
        ("confidence", pa.float32()),
        ("text", pa.string()),
    ]
)

ORIENTATION_STRUCT = pa.struct(
    [
        ("rotation", pa.int32()),
        ("confidence", pa.float32()),
    ]
)

# Per-page OCR result (output of the OCR actor stage).  ``error`` is
# the dead-letter column: null for healthy rows; a "Type: message"
# string when the per-row decode/recognize raised — the Ray analogue of
# the reference's catchable per-call Errors
# (/root/reference/src/ocr-engine.ts:179-185,205-207).  One corrupt
# pixel buffer must quarantine ONE row, not kill the job.
OCR_RESULT_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("text", pa.string()),
        ("words", pa.list_(TEXT_ITEM_STRUCT)),
        ("lines", pa.list_(TEXT_ITEM_STRUCT)),
        ("orientation", ORIENTATION_STRUCT),
        ("n_words", pa.int32()),
        ("error", pa.string()),
    ]
)

# Flat exploded span rows (stages/explode.py).
SPAN_ROWS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("offset", pa.int32()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
    ]
)

MANIFEST_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("config_fingerprint", pa.string()),
        ("model_version", pa.string()),
        ("input_files", pa.list_(pa.string())),
        ("n_docs", pa.int64()),
        ("n_spans", pa.int64()),
        ("n_words", pa.int64()),
        # dead-letter accounting: documents quarantined from this bucket
        # (any span errored) and the quarantine parquet holding their
        # span rows + error strings ("" when the bucket was clean)
        ("n_quarantined", pa.int64()),
        ("quarantine_file", pa.string()),
        ("wall_ms", pa.float64()),
        ("output_file", pa.string()),
    ]
)

# Quarantined span rows (dead-letter sink): the flat span rows of every
# document that contained at least one errored media span, plus the
# error string — enough to re-drive just the poison rows after a fix.
QUARANTINE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("offset", pa.int32()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("error", pa.string()),
    ]
)
