"""Stateless text-span extraction stage (map_batches over Arrow).

text / html / pdf kinds are extracted in place; media rows pass through
untouched (the classifier actor stage handles them). The per-row parser
calls (HTMLParser stack machine, layout sort) are genuine per-document
parsing work — the batch wrapper keeps allocation vectorized and the
column rebuild zero-copy for untouched columns.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.textext import extract_html_main, extract_pdf_layout, extract_text

_EXTRACTORS = {
    "text": extract_text,
    "html": extract_html_main,
    "pdf": extract_pdf_layout,
}


def extract_text_spans(batch: pa.Table) -> pa.Table:
    """Replace ``text`` with the extracted payload for text-like kinds;
    add a ``confidence`` column (1.0 for text-like, 0.0 placeholder for
    media until classified)."""
    kinds = batch.column("kind").to_pylist()
    texts = batch.column("text").to_pylist()
    out = []
    conf = []
    for kind, payload in zip(kinds, texts):
        fn = _EXTRACTORS.get(kind)
        if fn is None:
            out.append("")      # media: filled by the classifier stage
            conf.append(0.0)
        else:
            out.append(fn(payload or ""))
            conf.append(1.0)
    idx = batch.schema.get_field_index("text")
    result = batch.set_column(idx, "text", pa.array(out, type=pa.string()))
    if "confidence" not in result.schema.names:
        result = result.append_column("confidence", pa.array(conf, type=pa.float64()))
    return result
