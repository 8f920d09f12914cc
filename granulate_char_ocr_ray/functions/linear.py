"""Deterministic linear-model kernels (pure numpy, no ray import).

Distributed-training determinism: float addition is non-associative,
so a gradient summed across Ray blocks would depend on block
boundaries, reduce order, and parallelism level. Every per-row
gradient contribution is therefore quantized to int64 fixed point
(scale 2**24) BEFORE summation — integer addition IS associative, so
the folded global gradient is bit-identical for any partitioning (the
same exact-integer-aggregate trick the engine's money/count reduces
use). Per-row float math (dot products, sigmoid) is itself
deterministic: the feature dot expands to an explicit fixed-order
column accumulation rather than a BLAS gemv whose blocking could vary
with batch length.

Overflow headroom: |per-row contribution| <= max|x| * SCALE; with
bounded features (|x| <= ~2) that is < 2**26 per row, so an int64
block sum holds ~2**37 rows per block and the global fold ~2**37
blocks — far beyond any real partitioning. At more extreme scales,
halve GRAD_SCALE or fold per-block sums pairwise.
"""

from __future__ import annotations

import numpy as np

GRAD_SCALE = np.int64(1) << 24


def linear_z(X: np.ndarray, w: np.ndarray) -> np.ndarray:
    """X @ w[:-1] + w[-1] via fixed-order column accumulation —
    elementwise ops only, so the per-row result never depends on the
    number of rows in the batch (a BLAS gemv's internal blocking may)."""
    z = np.full(len(X), w[-1], dtype=np.float64)
    for j in range(X.shape[1]):
        z += X[:, j] * w[j]
    return z


def quantized_logreg_grad(X: np.ndarray, y: np.ndarray, w: np.ndarray
                          ) -> np.ndarray:
    """int64 fixed-point logistic-loss gradient partial for one batch:
    sum over rows of rint((sigmoid(z) - y) * [x, 1] * GRAD_SCALE).
    Summing these partials over any partitioning of the rows yields the
    same global int64 vector."""
    r = 1.0 / (1.0 + np.exp(-linear_z(X, w))) - y
    contrib = np.concatenate([X * r[:, None], r[:, None]], axis=1)
    return np.rint(contrib * float(GRAD_SCALE)).astype(np.int64).sum(
        axis=0, dtype=np.int64)


def quantized_colsums(X: np.ndarray) -> np.ndarray:
    """int64 fixed-point per-column sums (for deterministic feature
    centering): sum over rows of rint(x * GRAD_SCALE)."""
    return np.rint(X * float(GRAD_SCALE)).astype(np.int64).sum(
        axis=0, dtype=np.int64)


def logreg_fit_quantized(X: np.ndarray, y: np.ndarray, iters: int,
                         lr: float) -> tuple[np.ndarray, np.ndarray]:
    """Full-batch logistic regression with quantized-gradient descent
    on centered features. Returns (mu, w) where mu is the quantized
    feature-mean vector and w the (d+1,) weight vector (bias last).
    Exactly the computation the distributed trainer performs — shared
    with its brute-force test."""
    n = len(X)
    mu = quantized_colsums(X) / (float(GRAD_SCALE) * n)
    Xc = X - mu
    w = np.zeros(X.shape[1] + 1, dtype=np.float64)
    for _ in range(iters):
        g = quantized_logreg_grad(Xc, y, w)
        w = w - lr * (g / (float(GRAD_SCALE) * n))
    return mu, w
