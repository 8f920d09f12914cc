"""Glyph segmentation ops (pure NumPy).

- Horizontal-projection segmentation (the reference's production path,
  ``ocr_service.py:221-265``, M4): column-sum profile, threshold = 10% of
  max, runs wider than 10 px, vertical extent per run, min size 10x10.
- Connected-component segmentation (the contour path,
  ``ocr_service.py:267-285``, M5): 4-connected two-pass union-find
  labeling, bbox filter w,h > 5, sorted left-to-right by x.

Both return ordered lists of (x, y, w, h) int tuples — order is
load-bearing (regions sorted by x / scan order; ocr_service.py:283).
"""

from __future__ import annotations

import numpy as np

MIN_RUN_WIDTH = 10   # ocr_service.py:243 ("最小幅")
MIN_REGION_WH = 10   # ocr_service.py:262 width/height > 10
CC_MIN_WH = 5        # ocr_service.py:281 w,h > 5


def segment_projection(binary: np.ndarray) -> list[tuple[int, int, int, int]]:
    """Horizontal-projection segmentation, ocr_service.py:221-265.

    Scan the column-sum profile left to right; a character run starts
    when the profile exceeds 10% of its max and ends when it falls back;
    runs must be > MIN_RUN_WIDTH wide. For each run the vertical extent
    is the nonzero range of the row-sum profile within the run. Regions
    narrower/shorter than MIN_REGION_WH are dropped. Emitted in scan
    (left-to-right) order.
    """
    if binary.size == 0:
        return []
    hproj = binary.sum(axis=0, dtype=np.int64)
    if hproj.max() == 0:
        return []
    threshold = hproj.max() * 0.1
    above = hproj > threshold
    # run boundaries via diff on the padded boolean profile
    padded = np.concatenate(([False], above, [False]))
    d = np.diff(padded.astype(np.int8))
    starts = np.where(d == 1)[0]
    ends = np.where(d == -1)[0]
    regions: list[tuple[int, int, int, int]] = []
    for x_start, x_end in zip(starts, ends):
        if x_end - x_start <= MIN_RUN_WIDTH:
            continue
        vproj = binary[:, x_start:x_end].sum(axis=1, dtype=np.int64)
        ys = np.where(vproj > 0)[0]
        if len(ys) == 0:
            continue
        y_min, y_max = int(ys[0]), int(ys[-1])
        width = int(x_end - x_start)
        height = y_max - y_min + 1
        if width > MIN_REGION_WH and height > MIN_REGION_WH:
            regions.append((int(x_start), y_min, width, height))
    return regions


def label_components(binary: np.ndarray) -> np.ndarray:
    """4-connected component labeling (two-pass union-find), int32 labels
    (0 = background). NumPy row-vectorized; no cv2."""
    fg = binary > 0
    h, w = fg.shape
    labels = np.zeros((h, w), dtype=np.int32)
    parent = [0]  # parent[i] for label i; 0 is background sentinel

    def find(a: int) -> int:
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    next_label = 1
    for r in range(h):
        row = fg[r]
        if not row.any():
            continue
        # runs of foreground within the row
        padded = np.concatenate(([False], row, [False]))
        d = np.diff(padded.astype(np.int8))
        starts = np.where(d == 1)[0]
        ends = np.where(d == -1)[0]
        for s, e in zip(starts, ends):
            # labels of the row above overlapping this run (4-connectivity)
            if r > 0:
                above = labels[r - 1, s:e]
                neigh = np.unique(above[above > 0])
            else:
                neigh = np.empty(0, dtype=np.int32)
            if len(neigh) == 0:
                lab = next_label
                parent.append(lab)
                next_label += 1
            else:
                lab = int(neigh.min())
                for other in neigh:
                    union(lab, int(other))
            labels[r, s:e] = lab
    # resolve
    lut = np.arange(next_label, dtype=np.int32)
    for i in range(1, next_label):
        lut[i] = find(i)
    # compact label ids
    uniq = np.unique(lut[1:]) if next_label > 1 else np.empty(0, dtype=np.int32)
    remap = np.zeros(next_label, dtype=np.int32)
    remap[uniq] = np.arange(1, len(uniq) + 1, dtype=np.int32)
    return remap[lut[labels]]


def segment_components(binary: np.ndarray) -> list[tuple[int, int, int, int]]:
    """Connected-component segmentation, ocr_service.py:267-285.

    External-contour bboxes approximated by CC bboxes; filter w,h >
    CC_MIN_WH; sort left-to-right by x (ocr_service.py:283).
    """
    labels = label_components(binary)
    n = labels.max()
    if n == 0:
        return []
    regions = []
    for lab in range(1, n + 1):
        ys, xs = np.nonzero(labels == lab)
        x, y = int(xs.min()), int(ys.min())
        w = int(xs.max()) - x + 1
        h = int(ys.max()) - y + 1
        if w > CC_MIN_WH and h > CC_MIN_WH:
            regions.append((x, y, w, h))
    regions.sort(key=lambda r: r[0])
    return regions
