"""Single-process oracle extractor.

Runs the exact same ``functions/`` ops as the Ray pipeline, but in one
sequential loop (the shape of the reference's batch evaluation path,
``evaluate_new_testdata.py:31-80``). Engine output must equal oracle
output row-for-row on (doc_id, order, kind, text, media_ref) — the
BASELINE.json per-row invariant.
"""

from __future__ import annotations

import pyarrow as pa

from .functions.classify import classify_crops, prototype_matrix
from .functions.glyphs import decode_media_ref
from .functions.image import preprocess
from .functions.segment import segment_components, segment_projection
from .functions.textext import extract_html_main, extract_pdf_layout, extract_text
from .schema import SPANS_OUT_SCHEMA


def extract_media_text(media_ref: str, proto=None,
                       segmenter: str = "projection",
                       binarizer: str = "fixed",
                       cascade: bool = False,
                       chain: bool = False) -> tuple[str, float]:
    """Glyph pipeline for one media payload: decode -> binarize (fixed
    M1 / otsu M2 / adaptive M3) -> segment (projection M4 or
    connected-components M5) -> classify each crop (flat rule or
    ordered cascade) -> ordered concat.

    Mirrors ocr_service.py:92-162 (process_image) with the deterministic
    classifier. Undecodable payloads yield ("", 0.0) — the reference's
    swallow-into-empty-result policy (ocr_service.py:164-171).
    """
    if proto is None:
        proto, _ = prototype_matrix(chain)
    img = decode_media_ref(media_ref)
    if img is None:
        return "", 0.0
    binary = preprocess(img, binarizer=binarizer)
    seg = segment_components if segmenter == "cc" else segment_projection
    regions = seg(binary)
    crops = [binary[y: y + h, x: x + w] for (x, y, w, h) in regions]
    if cascade:
        import numpy as np

        from .functions.classify import (
            LETTERS,
            classify_cascade,
            glyph_feature,
            tight_crop,
        )

        feats = [glyph_feature(tc, chain) for tc in
                 (tight_crop(c) for c in crops) if tc is not None]
        if not feats:
            return "", 0.0
        letters, conf, _ = classify_cascade(np.stack(feats), proto)
        chars = [LETTERS[i] for i in letters if i >= 0]
        confs = conf[letters >= 0]
        if not chars:
            return "", 0.0
        return "".join(chars), float(confs.mean())
    return classify_crops(crops, proto, chain)


def extract_span(kind: str, text: str, media_ref: str, proto=None,
                 segmenter: str = "projection", binarizer: str = "fixed",
                 cascade: bool = False, chain: bool = False) -> tuple[str, float]:
    """Extract one span -> (output text, confidence)."""
    if kind == "media":
        return extract_media_text(media_ref, proto, segmenter, binarizer,
                                  cascade, chain)
    if kind == "html":
        return extract_html_main(text), 1.0
    if kind == "pdf":
        return extract_pdf_layout(text), 1.0
    return extract_text(text), 1.0


def extract_spans_table(docs: pa.Table, segmenter: str = "projection",
                        binarizer: str = "fixed", cascade: bool = False,
                        normalize_chain: bool = False) -> pa.Table:
    """docs (DOCS_SCHEMA) -> flat extracted spans, sorted (doc_id, order)."""
    proto, _ = prototype_matrix(normalize_chain)
    out = {"doc_id": [], "order": [], "kind": [], "text": [], "media_ref": []}
    doc_ids = docs.column("doc_id").to_pylist()
    spans_col = docs.column("spans").to_pylist()
    for doc_id, spans in zip(doc_ids, spans_col):
        for span in sorted(spans or [], key=lambda s: s["offset"]):
            text, _conf = extract_span(span["kind"], span["text"],
                                       span["media_ref"], proto, segmenter,
                                       binarizer, cascade, normalize_chain)
            out["doc_id"].append(doc_id)
            out["order"].append(span["offset"])
            out["kind"].append(span["kind"])
            out["text"].append(text)
            out["media_ref"].append(span["media_ref"])
    table = pa.Table.from_pydict(out, schema=SPANS_OUT_SCHEMA)
    return table.sort_by([("doc_id", "ascending"), ("order", "ascending")])
