"""Arrow schemas for the engine's tables.

The interleaved-document input schema follows BASELINE.json:input_hint;
the output span schema is the per-row invariant surface (reference
semantics: the ordered character/span sequence of
``backend/domain/entities/ocr_result.py:7-22`` generalized to spans).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),        # 'text' | 'html' | 'pdf' | 'media'
        pa.field("text", pa.string()),        # payload for text-like kinds
        pa.field("media_ref", pa.string()),   # payload pointer for media kind
        pa.field("offset", pa.int32()),       # original position within the doc
    ]
)

# Input: one row per document (Lance table in production; Parquet stand-in
# here — see sources/storage.py).
DOCS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# Flat extracted-span output — the invariant columns. Auxiliary columns
# (confidence, partition_id) may ride along but are excluded from the
# equality check (FIXTURES.md §3).
SPANS_OUT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("order", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
    ]
)

# Reassembled per-document output (the OCRResult analog:
# ocr_result.py:7-22 — ordered concat + mean confidence).
DOCS_OUT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("text", pa.string()),          # ordered concat of span texts
        pa.field("n_spans", pa.int32()),
        pa.field("avg_confidence", pa.float64()),
    ]
)

# Checkpoint / lineage manifest rows (FIXTURES.md §4).
CHECKPOINT_SCHEMA = pa.schema(
    [
        pa.field("run_id", pa.string()),
        pa.field("partition_id", pa.int32()),
        pa.field("state", pa.string()),         # 'committed'
        pa.field("docs", pa.int64()),
        pa.field("spans", pa.int64()),
        pa.field("glyphs", pa.int64()),
        pa.field("wall_s", pa.float64()),
        pa.field("stage_metrics", pa.string()),  # json
        pa.field("committed_at", pa.string()),
    ]
)
