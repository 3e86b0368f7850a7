"""Windowed kernel-SHAP analogue for the GMM scorer.

The reference wraps ``shap.KernelExplainer`` around sliding time windows
(size 10, stride 5) of a (T, F) CQCC instance, scoring coalitions by
``sigmoid(LLR)`` with masked-out windows replaced by a background
substitution, then averages overlapping window attributions into a (T, F)
heatmap (reference/tets_xai.py:28-67). shap is not installed here; this is
a self-contained kernel-SHAP implementation with the standard Shapley
kernel weights and a weighted least-squares solve — coalition evaluation is
one batched device call.
"""

from __future__ import annotations

from math import comb
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def time_windows(T: int, *, size: int = 10, stride: int = 5) -> np.ndarray:
    starts = list(range(0, max(T - size, 0) + 1, stride))
    if not starts:
        starts = [0]
    return np.asarray([(s, min(s + size, T)) for s in starts])  # (M, 2)


def _shapley_kernel_weight(M: int, s: int) -> float:
    if s == 0 or s == M:
        return 1e6  # enforced endpoints (standard kernel-SHAP practice)
    return (M - 1) / (comb(M, s) * s * (M - s))


def gmm_shap(
    score_fn: Callable,
    instance: np.ndarray,
    *,
    window_size: int = 10,
    stride: int = 5,
    n_coalitions: int = 256,
    background: np.ndarray | None = None,
    seed: int = 0,
) -> np.ndarray:
    """Per-cell SHAP heatmap (T, F) for a single instance.

    ``score_fn``: batched (B, T, F) -> (B,) probability (sigmoid LLR).
    ``background``: substitution values (T, F); defaults to the per-feature
    time mean of the instance.
    """
    x = np.asarray(instance)
    T, F = x.shape
    if background is None:
        background = np.broadcast_to(x.mean(axis=0, keepdims=True), x.shape)
    windows = time_windows(T, size=window_size, stride=stride)
    M = len(windows)

    rng = np.random.default_rng(seed)
    # coalition matrix: all-on, all-off, then random subsets
    Z = [np.ones(M), np.zeros(M)]
    sizes = rng.integers(1, M, size=max(n_coalitions - 2, 0))
    for s in sizes:
        z = np.zeros(M)
        z[rng.choice(M, s, replace=False)] = 1.0
        Z.append(z)
    Z = np.stack(Z)  # (C, M)

    # build masked instances: window m off -> replaced by background
    cell_mask = np.zeros((M, T), dtype=bool)
    for m, (lo, hi) in enumerate(windows):
        cell_mask[m, lo:hi] = True
    keep = np.ones((len(Z), T), dtype=bool)
    for m in range(M):
        off = Z[:, m] == 0
        keep[off] &= ~cell_mask[m][None, :]
    batch = np.where(keep[:, :, None], x[None], background[None]).astype(np.float32)

    vals = np.asarray(score_fn(jnp.asarray(batch)))  # (C,)
    base, full = vals[1], vals[0]

    w = np.asarray([_shapley_kernel_weight(M, int(z.sum())) for z in Z])
    # weighted least squares with intercept pinned to base value
    A = Z
    y = vals - base
    W = np.diag(w)
    AtW = A.T @ W
    phi = np.linalg.solve(AtW @ A + 1e-8 * np.eye(M), AtW @ y)
    # rescale so attributions sum exactly to full - base (efficiency axiom)
    total = phi.sum()
    if abs(total) > 1e-12:
        phi = phi * (full - base) / total

    # distribute each window's phi uniformly over its cells, average overlaps
    heat = np.zeros((T, F))
    counts = np.zeros((T, 1))
    for m, (lo, hi) in enumerate(windows):
        heat[lo:hi] += phi[m] / (hi - lo) / F
        counts[lo:hi] += 1
    return heat / np.maximum(counts, 1.0)
