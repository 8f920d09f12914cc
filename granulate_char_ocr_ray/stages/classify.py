"""Stateful glyph-classification stages (actor pools).

``GlyphClassifierStage`` is the fused path: decode -> binarize ->
segment -> classify, per media span, inside one actor ``__call__``. The
prototype feature matrix — the stand-in for the reference's warm CNN
(``ocr_service.py:287-329``, loaded once per ``OCRService``; here once
per ACTOR, fixing the reference's per-request reload inefficiency noted
at ``ocr.py:43``) — is built in ``__init__``. Hamming classification of
all glyphs in a batch is one vectorized XOR-popcount matmul.

``SegmentGlyphsStage`` / ``GlyphFeatureClassifier`` are the fan-out
(salted) path used for media-heavy skew: segmentation explodes each
media span into per-glyph feature rows keyed (doc_id, order, glyph_idx),
classification runs on the fixed-width feature rows, and a groupby
restores span text (pipelines/extract.py:extract_spans fanout mode).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.classify import (
    build_prototype_matrix,
    classify_features,
    glyph_feature,
    tight_crop,
)
from ..functions.glyphs import decode_media_ref
from ..functions.image import preprocess
from ..functions.segment import segment_components, segment_projection


def _span_glyph_features(media_ref: str,
                         segmenter: str = "projection",
                         binarizer: str = "fixed",
                         chain: bool = False) -> list[np.ndarray]:
    """decode -> preprocess -> segment -> per-glyph 64-bit features.

    Blank / undecodable spans yield []; blank crops are dropped (same
    skip semantics as oracle.classify_crops)."""
    img = decode_media_ref(media_ref)
    if img is None:
        return []
    binary = preprocess(img, binarizer=binarizer)
    seg = segment_components if segmenter == "cc" else segment_projection
    feats = []
    for (x, y, w, h) in seg(binary):
        crop = tight_crop(binary[y: y + h, x: x + w])
        if crop is not None:
            feats.append(glyph_feature(crop, chain))
    return feats


class GlyphClassifierStage:
    """Fused actor stage: fills ``text``/``confidence`` for media rows.

    Use: ``ds.map_batches(GlyphClassifierStage, batch_format="pyarrow",
    concurrency=N, batch_size=B)``.
    """

    def __init__(self, segmenter: str = "projection",
                 binarizer: str = "fixed", cascade: bool = False,
                 normalize_chain: bool = False) -> None:
        # prototypes featurize through the SAME path as live glyphs
        # (with the M6 chain when enabled) so clean glyphs match at 0
        self.proto, self.letters = build_prototype_matrix(normalize_chain)
        self.segmenter = segmenter
        self.binarizer = binarizer
        self.cascade = cascade
        self.normalize_chain = normalize_chain

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        media_rows = [i for i, k in enumerate(kinds) if k == "media"]
        if not media_rows:
            return batch
        refs = batch.column("media_ref").to_pylist()
        texts = batch.column("text").to_pylist()
        confs = (
            batch.column("confidence").to_pylist()
            if "confidence" in batch.schema.names
            else [0.0] * len(batch)
        )
        # gather every glyph in the batch, classify in one vectorized call
        feats: list[np.ndarray] = []
        owners: list[int] = []
        for i in media_rows:
            fs = _span_glyph_features(refs[i] or "", self.segmenter,
                                      self.binarizer, self.normalize_chain)
            feats.extend(fs)
            owners.extend([i] * len(fs))
        if feats:
            if self.cascade:
                from ..functions.classify import classify_cascade

                letters_idx, conf, _ = classify_cascade(np.stack(feats),
                                                        self.proto)
            else:
                letters_idx, conf = classify_features(np.stack(feats),
                                                      self.proto)
        else:
            letters_idx = np.empty(0, dtype=np.int64)
            conf = np.empty(0, dtype=np.float64)
        per_row_chars: dict[int, list[str]] = {i: [] for i in media_rows}
        per_row_conf: dict[int, list[float]] = {i: [] for i in media_rows}
        for owner, idx, cf in zip(owners, letters_idx, conf):
            if idx >= 0:
                per_row_chars[owner].append(self.letters[idx])
                per_row_conf[owner].append(float(cf))
        for i in media_rows:
            texts[i] = "".join(per_row_chars[i])
            confs[i] = float(np.mean(per_row_conf[i])) if per_row_conf[i] else 0.0
        t = batch.set_column(batch.schema.get_field_index("text"), "text",
                             pa.array(texts, type=pa.string()))
        if "confidence" in t.schema.names:
            t = t.set_column(t.schema.get_field_index("confidence"), "confidence",
                             pa.array(confs, type=pa.float64()))
        else:
            t = t.append_column("confidence", pa.array(confs, type=pa.float64()))
        return t


def segment_glyphs(batch: pa.Table, segmenter: str = "projection",
                   binarizer: str = "fixed") -> pa.Table:
    """Stateless fan-out: media span rows -> per-glyph feature rows.

    Output: (doc_id, order, kind, media_ref, glyph_idx:int32,
    feature:fixed_size_binary(64 bytes as uint8 bits -> packed into
    binary), n_glyphs:int32). Text-like rows pass through with
    glyph_idx=-1 and their already-extracted text. The per-glyph rows
    are the SALT: a whale document's glyphs scatter across blocks and
    classifier actors instead of pinning one worker (north-rule skew
    requirement; SURVEY.md §4.2)."""
    import pyarrow.compute as pc

    schema = pa.schema([
        ("doc_id", pa.string()), ("order", pa.int32()), ("kind", pa.string()),
        ("text", pa.string()), ("media_ref", pa.string()),
        ("confidence", pa.float64()), ("glyph_idx", pa.int32()),
        ("feature", pa.binary()),
    ])
    is_media = pc.equal(batch.column("kind"), "media")
    if "confidence" not in batch.schema.names:
        batch = batch.append_column(
            "confidence", pa.array(np.zeros(len(batch)), pa.float64()))

    # text-like rows pass through VECTORIZED (constant salt columns)
    passthrough = batch.filter(pc.invert(is_media))
    n_pt = len(passthrough)
    pt = pa.Table.from_arrays(
        [pc.cast(passthrough.column("doc_id"), pa.string()),
         pc.cast(passthrough.column("order"), pa.int32()),
         passthrough.column("kind"),
         passthrough.column("text"),
         passthrough.column("media_ref"),
         pc.cast(passthrough.column("confidence"), pa.float64()),
         pa.array(np.full(n_pt, -1, np.int32)),
         pa.array([b""] * n_pt, pa.binary())],
        schema=schema)

    media = batch.filter(is_media)
    if len(media) == 0:
        return pt
    # media spans: per-span decode+segment is inherently per-image; the
    # emitted rows assemble via numpy repeats, not per-row appends
    doc_ids = media.column("doc_id").to_pylist()
    orders = media.column("order").to_numpy(zero_copy_only=False)
    refs = media.column("media_ref").to_pylist()
    feat_lists = [
        _span_glyph_features(r or "", segmenter, binarizer) for r in refs
    ]
    counts = np.array([max(1, len(f)) for f in feat_lists], dtype=np.int64)
    glyph_idx = np.concatenate([
        np.arange(len(f), dtype=np.int32) if f else
        np.array([-2], dtype=np.int32)          # sentinel: span stays in output
        for f in feat_lists])
    # features in emission order, empty bytes for sentinel rows
    feat_col: list[bytes] = []
    for fl in feat_lists:
        if fl:
            feat_col.extend(np.packbits(f).tobytes() for f in fl)
        else:
            feat_col.append(b"")
    md = pa.Table.from_arrays(
        [pa.array(np.repeat(np.array(doc_ids, dtype=object), counts),
                  pa.string()),
         pa.array(np.repeat(orders, counts).astype(np.int32)),
         pa.array(np.repeat(np.array(["media"], dtype=object),
                            int(counts.sum())), pa.string()),
         pa.array([""] * int(counts.sum()), pa.string()),
         pa.array(np.repeat(np.array(refs, dtype=object), counts),
                  pa.string()),
         pa.array(np.zeros(int(counts.sum())), pa.float64()),
         pa.array(glyph_idx),
         pa.array(feat_col, pa.binary())],
        schema=schema)
    return pa.concat_tables([pt, md])


class GlyphFeatureClassifier:
    """Actor stage for the fan-out path: classify packed feature rows."""

    def __init__(self) -> None:
        self.proto, self.letters = build_prototype_matrix()

    def __call__(self, batch: pa.Table) -> pa.Table:
        glyph_idx = batch.column("glyph_idx").to_numpy(zero_copy_only=False)
        mask = glyph_idx >= 0
        if not mask.any():
            return batch
        rows = np.where(mask)[0]
        feat_col = batch.column("feature")
        if isinstance(feat_col, pa.ChunkedArray):
            feat_col = feat_col.combine_chunks()
        # one buffer concat + one unpackbits for the whole batch
        packed = np.frombuffer(
            b"".join(feat_col.take(pa.array(rows)).to_pylist()),
            dtype=np.uint8).reshape(len(rows), 8)
        feats = np.unpackbits(packed, axis=1)[:, :64]
        letters_idx, conf = classify_features(feats, self.proto)
        texts = batch.column("text").to_pylist()
        confs = batch.column("confidence").to_pylist()
        for r, idx, cf in zip(rows, letters_idx, conf):
            texts[r] = self.letters[idx] if idx >= 0 else ""
            confs[r] = float(cf) if idx >= 0 else 0.0
        t = batch.set_column(batch.schema.get_field_index("text"), "text",
                             pa.array(texts, type=pa.string()))
        return t.set_column(t.schema.get_field_index("confidence"), "confidence",
                            pa.array(confs, type=pa.float64()))
