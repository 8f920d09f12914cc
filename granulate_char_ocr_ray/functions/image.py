"""Image preprocessing ops (pure NumPy).

Re-expresses the reference's preprocessing semantics without cv2:
- polarity normalization + fixed threshold 128 + morphological close:
  ``backend/application/services/ocr_service.py:173-201`` (M1)
- Otsu threshold (argmax inter-class variance over a 256-bin histogram):
  ``optimize_preprocessing.py:81`` and variants (M2)
- 8x8 mean-threshold perceptual hash:
  ``backend/infrastructure/mapping/granulate_alphabet_generated.py:63-80`` (M7)
- area resize replaces cv2.resize for the hash path (deterministic bin
  means; identical in oracle and engine by construction).

All functions take/return uint8 arrays with values in {0..255}; binary
images use {0, 255} with glyph pixels = 255 (white-on-black after
polarity normalization, matching ocr_service.py:181-185).
"""

from __future__ import annotations

import numpy as np


def normalize_polarity(gray: np.ndarray) -> np.ndarray:
    """White-background images are inverted to black-background/white-glyph.

    Reference: ocr_service.py:181-185 (mean > 128 => invert).
    """
    if gray.mean() > 128:
        return (255 - gray).astype(np.uint8)
    return gray.astype(np.uint8)


def threshold_fixed(gray: np.ndarray, thresh: int = 128) -> np.ndarray:
    """Binary threshold: pixel > thresh -> 255 else 0 (ocr_service.py:195)."""
    return np.where(gray > thresh, 255, 0).astype(np.uint8)


def threshold_otsu(gray: np.ndarray) -> np.ndarray:
    """Otsu binarization (optimize_preprocessing.py:81 semantics).

    Computes the threshold maximizing inter-class variance over the
    256-bin histogram, then applies pixel > t -> 255.
    """
    hist = np.bincount(gray.ravel().astype(np.int64), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return np.zeros_like(gray, dtype=np.uint8)
    bins = np.arange(256, dtype=np.float64)
    w0 = np.cumsum(hist)
    w1 = total - w0
    sum0 = np.cumsum(hist * bins)
    mu_total = sum0[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        mu0 = sum0 / w0
        mu1 = (mu_total - sum0) / w1
        between = w0 * w1 * (mu0 - mu1) ** 2
    between[~np.isfinite(between)] = -1.0
    t = int(np.argmax(between))
    return np.where(gray > t, 255, 0).astype(np.uint8)


def morph_close_2x2(binary: np.ndarray) -> np.ndarray:
    """2x2 morphological close (dilate then erode), ocr_service.py:197-199.

    Closing = dilation by B followed by erosion by the REFLECTED B, so
    a clean binary image is a fixed point (idempotent) and single-pixel
    holes/gaps are filled.
    """
    b = binary > 0

    def dilate(m: np.ndarray) -> np.ndarray:
        # window (r..r+1, c..c+1)
        out = m.copy()
        out[:, :-1] |= m[:, 1:]
        out[:-1, :] |= m[1:, :]
        out[:-1, :-1] |= m[1:, 1:]
        return out

    def erode(m: np.ndarray) -> np.ndarray:
        # reflected window (r-1..r, c-1..c)
        out = m.copy()
        out[:, 1:] &= m[:, :-1]
        out[1:, :] &= m[:-1, :]
        out[1:, 1:] &= m[:-1, :-1]
        return out

    return np.where(erode(dilate(b)), 255, 0).astype(np.uint8)


def preprocess(gray: np.ndarray, binarizer: str = "fixed") -> np.ndarray:
    """Production preprocessing path (ocr_service.py:173-201, minus the
    cv2-only denoise/CLAHE steps which are identity on already-binary
    synthetic strips): polarity normalize -> threshold -> 2x2 close.
    """
    g = normalize_polarity(gray)
    if binarizer == "otsu":
        b = threshold_otsu(g)
    else:
        b = threshold_fixed(g)
    return morph_close_2x2(b)


def resize_area(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic area (bin-mean) resize to (out_h, out_w), float64 out.

    Bin edges are round(i * H / out_h); every bin spans at least one
    source pixel. Stands in for cv2.resize in the 8x8 hash path
    (granulate_alphabet_generated.py:70-76).
    """
    h, w = img.shape
    ys = np.round(np.arange(out_h + 1) * h / out_h).astype(np.int64)
    xs = np.round(np.arange(out_w + 1) * w / out_w).astype(np.int64)
    ys = np.minimum(ys, h)
    xs = np.minimum(xs, w)
    f = img.astype(np.float64)
    # integral image for O(1) bin sums
    integ = np.zeros((h + 1, w + 1), dtype=np.float64)
    integ[1:, 1:] = f.cumsum(axis=0).cumsum(axis=1)
    y0 = ys[:-1]
    y1 = np.maximum(ys[1:], y0 + 1)
    x0 = xs[:-1]
    x1 = np.maximum(xs[1:], x0 + 1)
    y1 = np.minimum(y1, h)
    x1 = np.minimum(x1, w)
    y0 = np.minimum(y0, y1 - 1)
    x0 = np.minimum(x0, x1 - 1)
    sums = (
        integ[np.ix_(y1, x1)]
        - integ[np.ix_(y0, x1)]
        - integ[np.ix_(y1, x0)]
        + integ[np.ix_(y0, x0)]
    )
    areas = np.outer(y1 - y0, x1 - x0).astype(np.float64)
    return sums / areas


def hash8x8(img: np.ndarray) -> str:
    """8x8 mean-threshold perceptual hash -> 64-char bitstring.

    Reference semantics: resize to 8x8, compare each pixel to the mean
    (granulate_alphabet_generated.py:70-80, create_mapping.py:18-30).
    """
    small = resize_area(img, 8, 8)
    avg = small.mean()
    bits = (small > avg).astype(np.uint8).ravel()
    return "".join("1" if b else "0" for b in bits)


def hash8x8_bits(img: np.ndarray) -> np.ndarray:
    """Same as :func:`hash8x8` but returns a uint8[64] bit vector."""
    small = resize_area(img, 8, 8)
    avg = small.mean()
    return (small > avg).astype(np.uint8).ravel()
