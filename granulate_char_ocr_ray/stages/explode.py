"""Explode stage: one document row -> one row per span.

Fully vectorized Arrow restructuring (no Python row loop): list lengths
-> repeated parent indices -> ``list_flatten`` -> struct field columns.
This stage IS the engine's doc-level skew defense: a media-heavy whale
document's spans spread across blocks immediately, and downstream
stages parallelize per-span (SURVEY.md §7.4). Order is carried
explicitly as the ``order`` column (= original span ``offset``); nothing
downstream relies on executor arrival order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def explode_spans(batch: pa.Table) -> pa.Table:
    """DOCS_SCHEMA batch -> flat span rows
    (doc_id, order, kind, text, media_ref). Docs with empty/null span
    lists emit no rows (ocr_service.py:164-171 empty-result policy)."""
    spans = batch.column("spans")
    if spans.num_chunks != 1:
        spans = spans.combine_chunks()
    else:
        spans = spans.chunk(0)
    lengths = pc.list_value_length(spans)
    lengths_np = lengths.to_numpy(zero_copy_only=False)
    lengths_np = np.nan_to_num(lengths_np, nan=0).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths_np)
    flat = pc.list_flatten(spans)
    doc_id = pc.take(batch.column("doc_id"), pa.array(doc_idx))
    return pa.Table.from_arrays(
        [
            doc_id.combine_chunks() if isinstance(doc_id, pa.ChunkedArray) else doc_id,
            pc.struct_field(flat, "offset"),
            pc.struct_field(flat, "kind"),
            pc.struct_field(flat, "text"),
            pc.struct_field(flat, "media_ref"),
        ],
        names=["doc_id", "order", "kind", "text", "media_ref"],
    )
