"""Glyph classification: 8x8 hash features + Hamming nearest-prototype.

Re-expresses the reference's deterministic recognizer:
- exact hash lookup (J1, ``granulate_alphabet_generated.py:55-80``)
- Hamming nearest-neighbor over the 26 prototypes with distance
  threshold 10 (J2, ``tests/debug/test_similarity_mapping.py:29-47``)

The prototype feature matrix is built by rendering each letter through
the SAME pipeline path a segmented glyph travels (render -> tight crop
-> area-resize 8x8 -> mean threshold), so a cleanly segmented synthetic
glyph matches its prototype at distance 0. This is the load-once model
state that the actor pool holds per worker (A1/A5 shape,
``ocr_service.py:287-329``); a trained CNN drops into the same seam.
"""

from __future__ import annotations

import numpy as np

from .glyphs import LETTERS, render_letter_tile
from .image import hash8x8_bits

HAMMING_THRESHOLD = 10  # test_similarity_mapping.py:34 (max_distance=10)


def tight_crop(binary: np.ndarray) -> np.ndarray | None:
    """Crop to the nonzero bounding box; None if blank."""
    ys, xs = np.nonzero(binary)
    if len(ys) == 0:
        return None
    return binary[ys.min(): ys.max() + 1, xs.min(): xs.max() + 1]


def glyph_feature(crop: np.ndarray, chain: bool = False) -> np.ndarray:
    """uint8[64] hash bits of a glyph crop (M7 semantics).

    ``chain=True`` routes the crop through the M6 CNN-input
    normalization chain (image.normalize_glyph: dilate -> re-threshold
    -> upscale -> pad square -> blur -> 64x64) before hashing — the
    robust path for non-synthetic glyphs; prototypes featurize through
    the SAME path so clean glyphs still match at distance 0."""
    if chain:
        from .image import normalize_glyph

        crop = normalize_glyph(crop)
    return hash8x8_bits(crop)


def build_prototype_matrix(chain: bool = False) -> tuple[np.ndarray, str]:
    """(26, 64) uint8 bit matrix of prototype features + letter string.

    Each prototype is featurized through the same render->crop->hash
    path as live glyphs (see module docstring).
    """
    rows = []
    for letter in LETTERS:
        tile = render_letter_tile(letter)
        crop = tight_crop(tile)
        assert crop is not None
        rows.append(glyph_feature(crop, chain))
    return np.stack(rows).astype(np.uint8), LETTERS


_PROTO_CACHE: dict[bool, np.ndarray] = {}


def prototype_matrix(chain: bool = False) -> tuple[np.ndarray, str]:
    """Module-cached prototype matrix (cheap; built once per process
    per feature path)."""
    if chain not in _PROTO_CACHE:
        _PROTO_CACHE[chain] = build_prototype_matrix(chain)[0]
    return _PROTO_CACHE[chain], LETTERS


def classify_features(features: np.ndarray, proto: np.ndarray,
                      threshold: int = HAMMING_THRESHOLD) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized Hamming NN for a (n, 64) uint8 feature batch.

    Returns (letters: int array of indices into LETTERS, -1 = no match;
    confidence: float64 = 1 - dist/64, 0.0 for no match). Matches the
    reference's decision rule: argmin Hamming distance, reject if the
    minimum exceeds the threshold (test_similarity_mapping.py:34-47).
    """
    if features.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    # (n, 26) distances via XOR-sum over the bit axis
    dists = (features[:, None, :] != proto[None, :, :]).sum(axis=2)
    best = dists.argmin(axis=1)
    best_d = dists[np.arange(len(best)), best]
    ok = best_d <= threshold
    letters = np.where(ok, best, -1)
    conf = np.where(ok, 1.0 - best_d / 64.0, 0.0)
    return letters, conf


def classify_crops(crops: list[np.ndarray], proto: np.ndarray,
                   chain: bool = False) -> tuple[str, float]:
    """Classify an ordered list of glyph crops -> (text, mean confidence).

    Unrecognized glyphs (blank or beyond threshold) are skipped, matching
    the reference's behavior of appending only recognized characters
    (ocr_service.py:144-154).
    """
    feats = []
    for c in crops:
        tc = tight_crop(c)
        feats.append(glyph_feature(tc, chain) if tc is not None else None)
    live = [f for f in feats if f is not None]
    if not live:
        return "", 0.0
    letters, conf = classify_features(np.stack(live), proto)
    chars = []
    confs = []
    for idx, cf in zip(letters, conf):
        if idx >= 0:
            chars.append(LETTERS[idx])
            confs.append(cf)
    if not chars:
        return "", 0.0
    return "".join(chars), float(np.mean(confs))


DEFAULT_CASCADE = (("exact", 1.0), ("hamming", 1.0 - HAMMING_THRESHOLD / 64.0))


def classify_cascade(
    features: np.ndarray,
    proto: np.ndarray,
    stages: tuple[tuple[str, float], ...] = DEFAULT_CASCADE,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Ordered recognizer cascade with threshold-based fallback — the
    engine form of the reference's CNN -> Tesseract -> hash confidence
    fusion (ocr_service.py:112-147): each glyph takes the FIRST stage
    whose confidence clears that stage's threshold; glyphs no stage
    accepts are unrecognized.

    In-sandbox members: ``"exact"`` (64-bit hash equality, confidence
    1.0 — J1) and ``"hamming"`` (nearest-prototype, confidence
    1 - d/64 — J2). A CNN or Tesseract recognizer drops in as another
    (name, min_conf) entry computing its own confidence vector.

    Returns (letter indices with -1 = unrecognized, confidence, stage
    index with -1 = unrecognized). Vectorized: each stage scores the
    still-unassigned glyphs only.
    """
    n = len(features)
    letters = np.full(n, -1, dtype=np.int64)
    conf = np.zeros(n, dtype=np.float64)
    stage_idx = np.full(n, -1, dtype=np.int64)
    if n == 0:
        return letters, conf, stage_idx
    pending = np.ones(n, dtype=bool)
    dists = (features[:, None, :] != proto[None, :, :]).sum(axis=2)
    best = dists.argmin(axis=1)
    best_d = dists[np.arange(n), best]
    for si, (name, min_conf) in enumerate(stages):
        if not pending.any():
            break
        if name == "exact":
            score = np.where(best_d == 0, 1.0, 0.0)
        elif name == "hamming":
            score = 1.0 - best_d / 64.0
        else:
            raise ValueError(f"unknown cascade recognizer {name!r}")
        take = pending & (score >= min_conf) & (score > 0)
        letters[take] = best[take]
        conf[take] = score[take]
        stage_idx[take] = si
        pending &= ~take
    return letters, conf, stage_idx


def exact_hash_lookup(bitstring: str) -> str | None:
    """Exact 64-bit hash -> letter (J1). Uses raw prototype hashes."""
    from .glyphs import PROTOTYPE_HASHES
    inv = {v: k for k, v in PROTOTYPE_HASHES.items()}
    return inv.get(bitstring)
