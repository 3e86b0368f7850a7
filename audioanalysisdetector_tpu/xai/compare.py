"""Cross-model attribution comparison + salient-interval extraction.

Counterparts of ``compare_gmm_bilstm`` / ``extract_top_intervals_global`` /
``plot_heatmaps_separately_stylish`` (reference/tets_xai.py:94-186): run
GMM kernel-SHAP, BiLSTM integrated gradients and occlusion on one instance,
bundle heatmaps + reductions, and extract the top-N salient time intervals
(threshold 1e-2, minimum 0.2 s at hop 512 / 16 kHz frame time).
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from audioanalysisdetector_tpu.xai.attribution import bilstm_heatmaps
from audioanalysisdetector_tpu.xai.shap_gmm import gmm_shap


def compare_gmm_bilstm(
    instance: np.ndarray,
    *,
    bilstm_apply: Callable,
    bilstm_variables: dict,
    gmm_score_fn: Callable,
    ig_steps: int = 50,
    shap_coalitions: int = 128,
    seed: int = 0,
) -> dict:
    """instance: (T, F) scaled CQCC. Returns heatmaps + importance dict."""
    x = jnp.asarray(instance)[None]  # (1, T, F)
    # one jitted program for IG + occlusion + reductions — eager evaluation
    # dispatches the surrounding ops one tunnel RPC at a time (CLAUDE.md)
    nn_maps = jax.jit(
        lambda v, xi: bilstm_heatmaps(bilstm_apply, v, xi, steps=ig_steps)
    )(bilstm_variables, x)
    shap_map = gmm_shap(
        gmm_score_fn, instance, n_coalitions=shap_coalitions, seed=seed
    )
    return {
        "heatmaps": {
            "gmm_shap": shap_map,  # (T, F)
            "bilstm_ig": np.asarray(nn_maps["ig"][0]),
            "bilstm_occlusion": np.asarray(nn_maps["occlusion"][0]),
        },
        "importance": {
            "feature_importance": np.asarray(nn_maps["feature_importance"][0]),
            "time_importance": np.asarray(nn_maps["time_importance"][0]),
        },
    }


def extract_top_intervals_global(
    heatmap: np.ndarray,
    *,
    top_n: int = 3,
    threshold: float = 1e-2,
    min_duration_s: float = 0.2,
    hop_length: int = 512,
    sr: int = 16000,
) -> list[tuple[float, float, float]]:
    """Top-N (start_s, end_s, mean_saliency) intervals where the per-frame
    |saliency| exceeds ``threshold`` for at least ``min_duration_s``
    (reference/tets_xai.py:131-160 semantics)."""
    per_frame = np.abs(np.asarray(heatmap)).mean(axis=-1) if heatmap.ndim == 2 else np.abs(heatmap)
    frame_time = hop_length / sr
    active = per_frame > threshold
    intervals = []
    start = None
    for i, a in enumerate(np.append(active, False)):
        if a and start is None:
            start = i
        elif not a and start is not None:
            dur = (i - start) * frame_time
            if dur >= min_duration_s:
                intervals.append(
                    (start * frame_time, i * frame_time, float(per_frame[start:i].mean()))
                )
            start = None
    intervals.sort(key=lambda t: -t[2])
    return intervals[:top_n]


def render_heatmap_figure(heatmap: np.ndarray, title: str):
    """One styled heatmap figure — the single render implementation shared
    by ``plot_heatmaps`` (PNG files) and ``xai.report`` (inline base64).
    ``heatmap`` is (T, F) time-major; the transpose puts time on x."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 4))
    im = ax.imshow(np.asarray(heatmap).T, aspect="auto", origin="lower", cmap="magma")
    ax.set_xlabel("time frame")
    ax.set_ylabel("coefficient")
    ax.set_title(title)
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    return fig


def plot_heatmaps(heatmaps: dict[str, np.ndarray], out_dir: str, *, prefix: str = "xai") -> list[str]:
    """Save one PNG per heatmap (reference's stylish-heatmap role)."""
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for name, hm in heatmaps.items():
        fig = render_heatmap_figure(hm, name)
        path = os.path.join(out_dir, f"{prefix}_{name}.png")
        fig.savefig(path, dpi=100)
        plt.close(fig)
        paths.append(path)
    return paths
