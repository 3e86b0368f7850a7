"""Perturbation visualizers (reference/xai_func.py:297-357, 465-525 roles).

Per-coefficient original-vs-perturbed line plots with changed rows / time
slices highlighted, saved as PNGs (headless-friendly).
"""

from __future__ import annotations

import os

import numpy as np

from audioanalysisdetector_tpu.xai.lime import signal_segmentation


def visualize_feature_perturbation(
    original: np.ndarray,
    perturbed: np.ndarray,
    mask: np.ndarray,
    *,
    out_path: str = "xai_out/perturbation_features.png",
    max_rows: int = 8,
) -> str:
    """Line plots per coefficient row; perturbed (mask==0) rows highlighted."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    original = np.asarray(original)
    perturbed = np.asarray(perturbed)
    changed = np.where(np.asarray(mask) == 0)[0]
    show = list(changed[: max_rows // 2])
    show += [i for i in range(original.shape[0]) if i not in show][: max_rows - len(show)]
    show.sort()

    fig, axes = plt.subplots(len(show), 1, figsize=(8, 1.6 * len(show)), sharex=True)
    for ax, r in zip(np.atleast_1d(axes), show):
        ax.plot(original[r], lw=1, label="original")
        ax.plot(perturbed[r], lw=1, ls="--", label="perturbed")
        tag = " (changed)" if r in changed else ""
        ax.set_ylabel(f"c{r}{tag}", fontsize=8)
        if r in changed:
            ax.set_facecolor("#fff3e0")
    np.atleast_1d(axes)[0].legend(loc="upper right", fontsize=8)
    np.atleast_1d(axes)[-1].set_xlabel("time frame")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path


def visualize_segment_perturbation(
    original: np.ndarray,
    perturbed: np.ndarray,
    mask: np.ndarray,
    *,
    num_slices: int | None = None,
    out_path: str = "xai_out/perturbation_segments.png",
    rows: tuple[int, ...] = (0, 1, 2),
) -> str:
    """Coefficient traces with perturbed time slices shaded."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    original = np.asarray(original)
    perturbed = np.asarray(perturbed)
    mask = np.asarray(mask)
    num_slices = num_slices or len(mask)
    seg = signal_segmentation(original.shape[-1], num_slices)
    # clamp to the rows that exist (same rule as the feature variant)
    rows = tuple(r for r in rows if r < original.shape[0]) or (0,)

    fig, axes = plt.subplots(len(rows), 1, figsize=(8, 1.8 * len(rows)), sharex=True)
    for ax, r in zip(np.atleast_1d(axes), rows):
        ax.plot(original[r], lw=1, label="original")
        ax.plot(perturbed[r], lw=1, ls="--", label="perturbed")
        for s, (lo, hi) in enumerate(seg):
            if mask[s] == 0:
                ax.axvspan(lo, hi, color="orange", alpha=0.2)
        ax.set_ylabel(f"c{r}", fontsize=8)
    np.atleast_1d(axes)[0].legend(loc="upper right", fontsize=8)
    np.atleast_1d(axes)[-1].set_xlabel("time frame")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path
