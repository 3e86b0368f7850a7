"""Plotting helpers — per-label feature histograms (EDA role).

Counterpart of ``plot_coeff_histograms_by_label_separately``
(reference/train_fun.py:197-223) and the EDA notebook's histogram cells,
saving PNGs instead of ``plt.show()`` (headless-friendly).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def plot_coeff_histograms_by_label(
    df: pd.DataFrame,
    coeff_col: str,
    *,
    label_col: str = "label",
    out_dir: str = "eda_plots",
    bins: int = 10,
    max_coeffs: int | None = None,
) -> list[str]:
    """One histogram PNG per coefficient, classes overlaid."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    df_clean = df.dropna(subset=[coeff_col])
    if df_clean.empty:
        print(f"no data for feature {coeff_col}")
        return []
    os.makedirs(out_dir, exist_ok=True)
    n_coeffs = len(np.ravel(df_clean[coeff_col].iloc[0]))
    if max_coeffs:
        n_coeffs = min(n_coeffs, max_coeffs)
    values = np.stack([np.ravel(v)[:n_coeffs] for v in df_clean[coeff_col]])
    labels = df_clean[label_col].values
    paths = []
    for i in range(n_coeffs):
        fig, ax = plt.subplots(figsize=(6, 4))
        for label in pd.unique(labels):
            subset = values[labels == label, i]
            ax.hist(subset, bins=bins, alpha=0.6, label=str(label), edgecolor="black")
        ax.set_title(f"{coeff_col}_{i + 1}")
        ax.set_xlabel("value")
        ax.set_ylabel("count")
        ax.legend()
        fig.tight_layout()
        path = os.path.join(out_dir, f"{coeff_col}_{i + 1}.png")
        fig.savefig(path, dpi=80)
        plt.close(fig)
        paths.append(path)
    return paths
