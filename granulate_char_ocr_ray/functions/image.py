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


def _sep_filter(img: np.ndarray, k1d: np.ndarray) -> np.ndarray:
    """Separable 2D filter with replicate borders (cv2 BORDER_REPLICATE
    — unlike reflect it supports windows larger than the image, which
    background-estimation-sized adaptive blocks need), float64 out;
    vectorized tap loop (k taps, whole-image adds)."""
    r = len(k1d) // 2
    f = img.astype(np.float64)
    p = np.pad(f, ((r, r), (0, 0)), mode="edge")
    out = np.zeros_like(f)
    for i, w in enumerate(k1d):
        out += w * p[i: i + f.shape[0], :]
    p = np.pad(out, ((0, 0), (r, r)), mode="edge")
    out = np.zeros_like(f)
    for i, w in enumerate(k1d):
        out += w * p[:, i: i + f.shape[1]]
    return out


def _gauss_kernel(ksize: int, sigma: float | None = None) -> np.ndarray:
    if sigma is None or sigma <= 0:
        # cv2's derived sigma for getGaussianKernel
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return k / k.sum()


def gaussian_blur(img: np.ndarray, ksize: int = 3,
                  sigma: float | None = None) -> np.ndarray:
    """Separable Gaussian blur (cv2.GaussianBlur semantics: derived
    sigma, reflect-101 borders), uint8 in -> uint8 out (rounded)."""
    out = _sep_filter(img, _gauss_kernel(ksize, sigma))
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def threshold_adaptive(gray: np.ndarray, block: int = 11, c: float = 2.0,
                       method: str = "gaussian") -> np.ndarray:
    """Local-adaptive binarization (M3;
    optimize_preprocessing.py:41-57's cv2.adaptiveThreshold
    ADAPTIVE_THRESH_GAUSSIAN_C/MEAN_C, block 11, C=2 — re-expressed in
    NumPy for this engine's white-glyph-on-black convention).

    A pixel is GLYPH iff it is brighter than its blockxblock local
    (gaussian- or box-weighted) mean by more than ``c`` — the
    sign-flipped form of cv2's dark-text rule, so flat background stays
    background and output stays {0, 255} white-on-black. Robust to
    slowly-varying illumination that defeats any single global
    threshold; strokes must be thinner than ~block/2 (the standard
    adaptive-threshold regime; see the degraded-strip fixture test)."""
    f = gray.astype(np.float64)
    if method == "mean":
        local = _sep_filter(f, np.full(block, 1.0 / block))
    else:
        local = _sep_filter(f, _gauss_kernel(block))
    return np.where(f > local + c, 255, 0).astype(np.uint8)


def dilate3_cross(binary: np.ndarray) -> np.ndarray:
    """Dilation by the 3x3 cross (cv2 MORPH_ELLIPSE (3,3)),
    ocr_service.py:344-346."""
    m = binary > 0
    out = m.copy()
    out[1:, :] |= m[:-1, :]
    out[:-1, :] |= m[1:, :]
    out[:, 1:] |= m[:, :-1]
    out[:, :-1] |= m[:, 1:]
    return np.where(out, 255, 0).astype(np.uint8)


def resize_nn(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (stands in for cv2 INTER_CUBIC on binary
    glyphs — cubic ringing would need re-thresholding anyway)."""
    h, w = img.shape
    ys = np.minimum((np.arange(out_h) * h / out_h).astype(np.int64), h - 1)
    xs = np.minimum((np.arange(out_w) * w / out_w).astype(np.int64), w - 1)
    return img[np.ix_(ys, xs)]


def normalize_glyph(crop: np.ndarray, target: int = 64) -> np.ndarray:
    """CNN-input glyph normalization chain (M6,
    ocr_service.py:337-376): dilate (3x3 cross) -> re-threshold 128 ->
    upscale so min side >= 48 -> pad square (centered) -> 3x3 gaussian
    blur -> re-threshold 128 -> resize to target x target. uint8
    {0,255} in and out."""
    img = threshold_fixed(dilate3_cross(crop), 128)
    h, w = img.shape
    if h < 48 or w < 48:
        scale = max(48 / h, 48 / w)
        img = resize_nn(img, max(1, int(h * scale)), max(1, int(w * scale)))
    h, w = img.shape
    if h != w:
        size = max(h, w)
        padded = np.zeros((size, size), dtype=np.uint8)
        y0, x0 = (size - h) // 2, (size - w) // 2
        padded[y0: y0 + h, x0: x0 + w] = img
        img = padded
    img = threshold_fixed(gaussian_blur(img, 3), 128)
    return resize_nn(img, target, target)


def estimate_skew_deg(binary: np.ndarray) -> float:
    """Skew estimate (M8, optimize_preprocessing.py:102-128's
    minAreaRect deskew): principal-axis angle of the glyph-pixel cloud
    (PCA of (x, y) coordinates), clamped to (-45, 45] degrees. 0.0 for
    blank or degenerate images."""
    ys, xs = np.nonzero(binary)
    if len(ys) < 2:
        return 0.0
    x = xs - xs.mean()
    y = ys - ys.mean()
    cov_xx, cov_yy, cov_xy = (x * x).mean(), (y * y).mean(), (x * y).mean()
    if abs(cov_xy) < 1e-12 and abs(cov_xx - cov_yy) < 1e-12:
        return 0.0
    angle = 0.5 * np.degrees(np.arctan2(2 * cov_xy, cov_xx - cov_yy))
    if angle > 45:
        angle -= 90
    elif angle <= -45:
        angle += 90
    return float(angle)


def rotate_nn(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """Rotate about the center by ``angle_deg`` (counter-clockwise in
    image coordinates), nearest-neighbor inverse mapping, same output
    shape, zeros outside."""
    if abs(angle_deg) < 1e-9:
        return img.copy()
    h, w = img.shape
    cy, cx = (h - 1) / 2, (w - 1) / 2
    t = np.radians(angle_deg)
    cos_t, sin_t = np.cos(t), np.sin(t)
    yy, xx = np.mgrid[0:h, 0:w]
    # inverse map: output (y, x) pulls from input rotated by -angle
    sx = cos_t * (xx - cx) + sin_t * (yy - cy) + cx
    sy = -sin_t * (xx - cx) + cos_t * (yy - cy) + cy
    sxi = np.round(sx).astype(np.int64)
    syi = np.round(sy).astype(np.int64)
    ok = (sxi >= 0) & (sxi < w) & (syi >= 0) & (syi < h)
    out = np.zeros_like(img)
    out[ok] = img[syi[ok], sxi[ok]]
    return out


def deskew(binary: np.ndarray) -> np.ndarray:
    """Orientation correction (M8): estimate skew, rotate it out."""
    return rotate_nn(binary, -estimate_skew_deg(binary))


def median_blur3(img: np.ndarray) -> np.ndarray:
    """3x3 median filter (the cv2.medianBlur denoise step of the
    reference's morphological preprocessing variant,
    optimize_preprocessing.py:66-67), replicate borders. Vectorized:
    median over the 9 stacked shifted views."""
    p = np.pad(img, 1, mode="edge")
    h, w = img.shape
    stack = np.stack([p[dy: dy + h, dx: dx + w]
                      for dy in range(3) for dx in range(3)])
    return np.median(stack, axis=0).astype(np.uint8)


def sharpen3(img: np.ndarray) -> np.ndarray:
    """3x3 sharpening convolution (kernel center 9, neighbors -1 — the
    reference's combined-preprocessing step,
    optimize_preprocessing.py:127-131), replicate borders, clipped."""
    p = np.pad(img.astype(np.float64), 1, mode="edge")
    h, w = img.shape
    out = 9.0 * p[1: 1 + h, 1: 1 + w]
    for dy in range(3):
        for dx in range(3):
            if dy == 1 and dx == 1:
                continue
            out -= p[dy: dy + h, dx: dx + w]
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def clahe(gray: np.ndarray, clip_limit: float = 2.0,
          tiles: tuple[int, int] = (8, 8)) -> np.ndarray:
    """Contrast-limited adaptive histogram equalization (the cv2
    createCLAHE step of the reference's edge-preserving / combined
    preprocessing variants, optimize_preprocessing.py:104-108 — the M1
    enhancement previously omitted). Pure NumPy: per-tile clipped
    histograms -> per-tile equalization LUTs -> bilinear interpolation
    of the four surrounding tile LUTs per pixel (the standard CLAHE
    formulation, Zuiderveld 1994)."""
    h, w = gray.shape
    ty, tx = tiles
    # tile edges (cover the image exactly; last tile absorbs remainder)
    ys = np.linspace(0, h, ty + 1).astype(np.int64)
    xs = np.linspace(0, w, tx + 1).astype(np.int64)
    luts = np.zeros((ty, tx, 256), dtype=np.float64)
    for i in range(ty):
        for j in range(tx):
            tile = gray[ys[i]: ys[i + 1], xs[j]: xs[j + 1]]
            n = tile.size
            if n == 0:
                luts[i, j] = np.arange(256)
                continue
            hist = np.bincount(tile.ravel().astype(np.int64),
                               minlength=256).astype(np.float64)
            clip = max(clip_limit * n / 256.0, 1.0)
            excess = np.maximum(hist - clip, 0.0).sum()
            hist = np.minimum(hist, clip) + excess / 256.0
            cdf = np.cumsum(hist)
            luts[i, j] = np.clip(cdf / n * 255.0, 0, 255)
    # per-pixel bilinear interpolation between the 4 nearest tile LUTs
    cy = (ys[:-1] + ys[1:]) / 2.0
    cx = (xs[:-1] + xs[1:]) / 2.0
    py = np.arange(h, dtype=np.float64)
    px = np.arange(w, dtype=np.float64)
    iy = np.clip(np.searchsorted(cy, py) - 1, 0, ty - 2) if ty > 1 else \
        np.zeros(h, dtype=np.int64)
    ix = np.clip(np.searchsorted(cx, px) - 1, 0, tx - 2) if tx > 1 else \
        np.zeros(w, dtype=np.int64)
    if ty > 1:
        fy = np.clip((py - cy[iy]) / (cy[iy + 1] - cy[iy]), 0.0, 1.0)
    else:
        fy = np.zeros(h)
    if tx > 1:
        fx = np.clip((px - cx[ix]) / (cx[ix + 1] - cx[ix]), 0.0, 1.0)
    else:
        fx = np.zeros(w)
    g = gray.astype(np.int64)
    iy2 = np.minimum(iy + 1, ty - 1)
    ix2 = np.minimum(ix + 1, tx - 1)
    IY, IX = iy[:, None], ix[None, :]
    IY2, IX2 = iy2[:, None], ix2[None, :]
    v00 = luts[IY, IX, g]
    v01 = luts[IY, IX2, g]
    v10 = luts[IY2, IX, g]
    v11 = luts[IY2, IX2, g]
    FY, FX = fy[:, None], fx[None, :]
    out = ((1 - FY) * ((1 - FX) * v00 + FX * v01)
           + FY * ((1 - FX) * v10 + FX * v11))
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def bilateral_filter(img: np.ndarray, d: int = 9,
                     sigma_color: float = 75.0,
                     sigma_space: float = 75.0) -> np.ndarray:
    """Edge-preserving bilateral denoise (cv2.bilateralFilter(gray, 9,
    75, 75) — the reference's noise-reduction step in its
    edge-preserving and color-aware preprocessing variants,
    optimize_preprocessing.py:58,88 and the production service's
    denoise pass, ocr_service_backup.py:171-172; the last M1 component
    previously omitted). Pure NumPy, vectorized over the d*d window
    offsets: per-offset weight = spatial gaussian * range gaussian of
    the center/neighbor intensity difference; output = weighted mean.
    Replicate borders, matching cv2's BORDER_REPLICATE behavior in
    spirit (cv2's exact border mode is BORDER_DEFAULT/reflect101 —
    interior pixels, which is all the glyph content, are unaffected)."""
    r = d // 2
    h, w = img.shape
    f = img.astype(np.float64)
    p = np.pad(f, r, mode="edge")
    num = np.zeros((h, w), dtype=np.float64)
    den = np.zeros((h, w), dtype=np.float64)
    inv2sc = 1.0 / (2.0 * sigma_color * sigma_color)
    inv2ss = 1.0 / (2.0 * sigma_space * sigma_space)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            sw = np.exp(-(dy * dy + dx * dx) * inv2ss)
            q = p[r + dy: r + dy + h, r + dx: r + dx + w]
            diff = q - f
            wgt = sw * np.exp(-(diff * diff) * inv2sc)
            num += wgt * q
            den += wgt
    return np.clip(np.round(num / den), 0, 255).astype(np.uint8)


def rgb_to_gray(img: np.ndarray) -> np.ndarray:
    """(h, w, 3) RGB -> (h, w) uint8 gray, BT.601 luma weights — the
    color-aware preprocessing entry (M9; the reference's cv2.cvtColor
    BGR2GRAY step in every preprocessing variant,
    optimize_preprocessing.py:32-35)."""
    f = img.astype(np.float64)
    gray = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    return np.clip(np.round(gray), 0, 255).astype(np.uint8)


def rgb_to_hsv_cv(img: np.ndarray) -> np.ndarray:
    """(h, w, 3) RGB uint8 -> (h, w, 3) HSV in the OpenCV uint8
    convention (H in [0, 180), S and V in [0, 255]) — the color space
    of the reference's color-aware preprocessing
    (preprocess_color_images.py:53,77). Vectorized np.select over the
    argmax channel."""
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    mx = f.max(axis=-1)
    mn = f.min(axis=-1)
    diff = mx - mn
    safe = np.where(diff > 0, diff, 1.0)
    h_deg = np.select(
        [diff == 0, mx == r, mx == g],
        [0.0,
         (60.0 * (g - b) / safe) % 360.0,
         60.0 * (b - r) / safe + 120.0],
        default=60.0 * (r - g) / safe + 240.0)
    h = np.round(h_deg / 2.0) % 180.0
    s = np.where(mx > 0, 255.0 * diff / np.where(mx > 0, mx, 1.0), 0.0)
    return np.stack([h, np.round(s), np.round(mx)],
                    axis=-1).astype(np.uint8)


def _dilate3(binary: np.ndarray) -> np.ndarray:
    p = np.pad(binary, 1, mode="constant")
    h, w = binary.shape
    out = np.zeros_like(binary)
    for dy in range(3):
        for dx in range(3):
            np.maximum(out, p[dy: dy + h, dx: dx + w], out=out)
    return out


def _erode3(binary: np.ndarray) -> np.ndarray:
    p = np.pad(binary, 1, mode="edge")
    h, w = binary.shape
    out = np.full_like(binary, 255)
    for dy in range(3):
        for dx in range(3):
            np.minimum(out, p[dy: dy + h, dx: dx + w], out=out)
    return out


def morph_close3(binary: np.ndarray) -> np.ndarray:
    """3x3 closing (dilate then erode) — cv2.MORPH_CLOSE with a ones
    kernel (preprocess_color_images.py:93-95)."""
    return _erode3(_dilate3(binary))


def morph_open3(binary: np.ndarray) -> np.ndarray:
    """3x3 opening (erode then dilate) — cv2.MORPH_OPEN."""
    return _dilate3(_erode3(binary))


# Granulate glyph color ranges in cv2 HSV units — the reference's
# ColorAwarePreprocessor.color_ranges table
# (preprocess_color_images.py:17-22). Data, not code: the published
# hue/sat/val windows for the alphabet's known ink colors.
GLYPH_COLOR_RANGES: dict[str, tuple[tuple[int, int, int],
                                    tuple[int, int, int]]] = {
    "purple": ((120, 50, 50), (150, 255, 255)),
    "yellow": ((20, 100, 100), (30, 255, 255)),
    "white": ((0, 0, 200), (180, 30, 255)),
    "black": ((0, 0, 0), (180, 255, 30)),
}


def hsv_in_range(hsv: np.ndarray, lower: tuple[int, int, int],
                 upper: tuple[int, int, int]) -> np.ndarray:
    """cv2.inRange: 255 where every channel lies in [lower, upper]."""
    lo = np.asarray(lower, dtype=np.float64)
    hi = np.asarray(upper, dtype=np.float64)
    f = hsv.astype(np.float64)
    ok = np.all((f >= lo) & (f <= hi), axis=-1)
    return np.where(ok, 255, 0).astype(np.uint8)


def rgb_to_lab_l(img: np.ndarray) -> np.ndarray:
    """(h, w, 3) RGB uint8 -> CIE LAB lightness channel scaled to
    uint8 [0, 255] (cv2's 8-bit L convention, L* x 255/100) — the
    'multigrade' path's working channel
    (preprocess_color_images.py:103-106). sRGB linearization -> Y ->
    L* (standard CIE formulas)."""
    f = img.astype(np.float64) / 255.0
    lin = np.where(f <= 0.04045, f / 12.92, ((f + 0.055) / 1.055) ** 2.4)
    y = (0.2126 * lin[..., 0] + 0.7152 * lin[..., 1]
         + 0.0722 * lin[..., 2])
    fy = np.where(y > 0.008856, np.cbrt(y), 7.787 * y + 16.0 / 116.0)
    l_star = np.clip(116.0 * fy - 16.0, 0.0, 100.0)
    return np.clip(np.round(l_star * 255.0 / 100.0), 0,
                   255).astype(np.uint8)


def color_aware_preprocess(img: np.ndarray, mode: str = "auto",
                           color_ranges: dict | None = None
                           ) -> np.ndarray:
    """Color-aware preprocessing (M9) — the reference's
    ColorAwarePreprocessor decision tree
    (preprocess_color_images.py:24-142), pure NumPy:

    - ``auto``: 2-D input -> ``binary``; else mean HSV saturation > 50
      -> ``color``, otherwise ``multigrade``.
    - ``color``: OR of the known glyph-ink HSV in-range masks (only
      ranges that match at least one pixel contribute), then 3x3 close
      + open. Falls back to ``binary`` when no range matches.
    - ``multigrade``: LAB lightness -> CLAHE (clip 3.0) -> bilateral;
      gray input uses clip 2.0. Returns enhanced GRAY (not binary) —
      feed it to ``preprocess`` for binarization.
    - ``binary``: gray -> gaussian adaptive threshold (block 11, C=2)
      -> 2x2 close.
    """
    ranges = GLYPH_COLOR_RANGES if color_ranges is None else color_ranges
    if mode == "auto":
        if img.ndim == 2:
            mode = "binary"
        else:
            sat = rgb_to_hsv_cv(img)[..., 1]
            mode = "color" if sat.mean() > 50.0 else "multigrade"
    if mode == "color" and img.ndim == 3:
        hsv = rgb_to_hsv_cv(img)
        combined = None
        for lower, upper in ranges.values():
            m = hsv_in_range(hsv, lower, upper)
            if int(m.sum()) > 0:
                combined = m if combined is None else np.maximum(
                    combined, m)
        if combined is not None:
            return morph_open3(morph_close3(combined))
        mode = "binary"
    if mode == "multigrade":
        if img.ndim == 3:
            return bilateral_filter(clahe(rgb_to_lab_l(img),
                                          clip_limit=3.0))
        return bilateral_filter(clahe(img, clip_limit=2.0))
    gray = rgb_to_gray(img) if img.ndim == 3 else img
    return morph_close_2x2(threshold_adaptive(gray, block=11, c=2.0,
                                              method="gaussian"))


def preprocess(gray: np.ndarray, binarizer: str = "fixed",
               adaptive_block: int = 11, adaptive_c: float = 2.0,
               adaptive_method: str = "gaussian",
               orient: bool = False, enhance: str | None = None,
               clahe_clip: float = 2.0,
               color_mode: str | None = None) -> np.ndarray:
    """Production preprocessing path (ocr_service.py:173-201, minus the
    cv2-only denoise/CLAHE steps which are identity on already-binary
    synthetic strips): polarity normalize -> threshold (fixed M1 /
    otsu M2 / adaptive M3) -> 2x2 close. The adaptive branch blurs 3x3
    first (optimize_preprocessing.py:48-56's denoise step); its defaults
    are the reference's (gaussian, block 11, C=2 — the thin-stroke
    camera regime). For the synthetic glyph strips, whose marks are
    FILLED blobs rather than strokes, pass a background-estimation-sized
    block (>= ~3x the blob width) with ``adaptive_method="mean"`` — the
    Sauvola-style large-window setting; see the degraded-strip fixture
    test for both regimes. ``orient=True`` inserts the M8 orientation
    correction (deskew) after binarization, before the close; a 3-channel
    input takes the color-aware gray conversion first (M9).
    """
    if color_mode is not None and gray.ndim == 3:
        # full color-aware route (M9): 'color' may return a finished
        # binary mask; 'multigrade'/'binary' hand back gray/binary that
        # continues through the normal chain
        out = color_aware_preprocess(gray, mode=color_mode)
        u = np.unique(out)
        if len(u) <= 2 and set(int(v) for v in u) <= {0, 255}:
            b = out if not orient else deskew(out)
            return morph_close_2x2(b)
        gray = out                        # enhanced gray (multigrade)
    if gray.ndim == 3:
        gray = rgb_to_gray(gray)          # color-aware entry (M9)
    if enhance == "clahe":
        # contrast enhancement BEFORE polarity/threshold (the reference's
        # CLAHE step in its enhanced preprocessing variants). Note the
        # clip limit CAPS equalization strength: near-two-level images
        # need a high clip (clipping redistributes their whole histogram
        # mass, flattening the mapping back to identity at low clips)
        gray = clahe(gray, clip_limit=clahe_clip)
    elif enhance == "median":
        gray = median_blur3(gray)         # denoise variant (M1 family)
    elif enhance == "sharpen":
        gray = sharpen3(gray)             # combined-preprocess variant
    elif enhance == "bilateral":
        gray = bilateral_filter(gray)     # edge-preserving denoise (M1)
    g = normalize_polarity(gray)
    if binarizer == "otsu":
        b = threshold_otsu(g)
    elif binarizer == "adaptive":
        b = threshold_adaptive(gaussian_blur(g, 3), block=adaptive_block,
                               c=adaptive_c, method=adaptive_method)
    else:
        b = threshold_fixed(g)
    if orient:
        b = deskew(b)
    return morph_close_2x2(b)


from functools import lru_cache


@lru_cache(maxsize=4096)
def _resize_bins(h: int, w: int, out_h: int, out_w: int):
    """Memoized bin edges for :func:`resize_area` — glyph crop shapes
    repeat heavily in the classifier hot loop, and the edge/area
    arrays depend only on the (in, out) shape pair."""
    ys = np.round(np.arange(out_h + 1) * h / out_h).astype(np.int64)
    xs = np.round(np.arange(out_w + 1) * w / out_w).astype(np.int64)
    ys = np.minimum(ys, h)
    xs = np.minimum(xs, w)
    strict = bool(h >= out_h and w >= out_w
                  and (np.diff(ys) > 0).all() and (np.diff(xs) > 0).all())
    areas = (np.outer(np.diff(ys), np.diff(xs)).astype(np.float64)
             if strict else None)
    return ys, xs, strict, areas


def resize_area(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic area (bin-mean) resize to (out_h, out_w), float64 out.

    Bin edges are round(i * H / out_h); every bin spans at least one
    source pixel. Stands in for cv2.resize in the 8x8 hash path
    (granulate_alphabet_generated.py:70-76).
    """
    h, w = img.shape
    ys, xs, strict, areas = _resize_bins(h, w, out_h, out_w)
    f = img.astype(np.float64)
    if strict:
        # non-overlapping bins (the h >= out_h common case): two
        # reduceat folds beat the integral image on tiny glyph crops
        # (~3x in the classifier hot path). Bit-identical: pixel sums
        # are integer-valued float64, exact under any fold order.
        rowsum = np.add.reduceat(f, ys[:-1], axis=0)
        sums = np.add.reduceat(rowsum, xs[:-1], axis=1)
        return sums / areas
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


def augment_glyph(img: np.ndarray, seed: int, max_shift: int = 2,
                  max_angle: float = 3.0, brightness: tuple = (0.9, 1.1),
                  noise_p: float = 0.0) -> np.ndarray:
    """Deterministic training-data augmentation for one glyph image —
    the M11 augmentation map (reference
    training_data/scripts/augment_simple.py:17-83: random rotate /
    translate / brightness / noise), made reproducible for a
    distributed engine by seeding a PCG64 stream per glyph: the same
    (image, seed) always yields the same augmented image on any worker,
    so augmented corpora are resumable and hash-stable.

    Order matches the reference: rotate -> translate -> brightness ->
    salt noise. Pure NumPy (rotate_nn); uint8 in/out.
    """
    rng = np.random.Generator(np.random.PCG64(seed))
    out = img
    angle = float(rng.uniform(-max_angle, max_angle))
    if abs(angle) > 1e-9:
        out = rotate_nn(out, angle)
    dy, dx = (int(rng.integers(-max_shift, max_shift + 1)),
              int(rng.integers(-max_shift, max_shift + 1)))
    if dy or dx:
        shifted = np.zeros_like(out)
        h, w = out.shape
        ys = slice(max(dy, 0), h + min(dy, 0))
        xs = slice(max(dx, 0), w + min(dx, 0))
        ys_src = slice(max(-dy, 0), h + min(-dy, 0))
        xs_src = slice(max(-dx, 0), w + min(-dx, 0))
        shifted[ys, xs] = out[ys_src, xs_src]
        out = shifted
    gain = float(rng.uniform(*brightness))
    out = np.clip(out.astype(np.float64) * gain, 0, 255).astype(np.uint8)
    if noise_p > 0:
        flips = rng.random(out.shape) < noise_p
        out = np.where(flips, 255 - out, out).astype(np.uint8)
    return out


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (n x n), cached."""
    global _DCT32
    if _DCT32 is None or _DCT32.shape[0] != n:
        k = np.arange(n)
        c = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
        c *= np.sqrt(2.0 / n)
        c[0] *= np.sqrt(0.5)
        _DCT32 = c
    return _DCT32


def phash64(img: np.ndarray) -> np.uint64:
    """DCT perceptual hash (pHash): area-resize to 32x32, 2-D DCT-II
    (two matrix multiplies against the cached orthonormal basis), keep
    the top-left 8x8 low-frequency block, threshold each coefficient
    against the MEDIAN of the 63 AC coefficients (DC excluded from the
    median but still emitted as bit 0 vs the median) -> 64-bit hash.
    Robust to rescaling and small pixel noise where hash8x8 (aHash)
    reacts; the standard image near-dup fingerprint."""
    small = resize_area(img, 32, 32)
    c = _dct_matrix(32)
    coef = c @ small @ c.T
    block = coef[:8, :8].ravel()
    med = np.median(block[1:])
    bits = block > med
    return np.uint64(
        np.packbits(bits.astype(np.uint8)).view(">u8")[0])
