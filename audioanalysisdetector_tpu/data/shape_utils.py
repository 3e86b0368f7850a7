"""Shape utilities over feature-cell DataFrames (reference parity helpers).

Counterparts of ``_to_array_safe`` / ``build_X_from_df``
(reference/ASV_dl_func.py:1519-1559 — flatten ragged feature cells and
zero-pad into a design matrix) and ``prepare_data_GMM_BiLSTM``
(:1761-1766 — drop null cells then time-major-ize CQCC).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from audioanalysisdetector_tpu.data.balance import filtr_nan


def to_array_safe(x) -> np.ndarray:
    """Any cell value -> 1-D float array ([] for None)."""
    if x is None:
        return np.array([])
    try:
        arr = np.asarray(x)
    except Exception:
        arr = np.asarray([x])
    return np.ravel(arr)


def build_X_from_df(df: pd.DataFrame, feature_cols: list[str]) -> np.ndarray:
    """Concat-flatten the named feature cells per row; zero-pad ragged rows."""
    rows = []
    for _, row in df.iterrows():
        parts = [to_array_safe(row[c]) for c in feature_cols]
        parts = [p for p in parts if p.size > 0]
        rows.append(np.hstack(parts) if parts else np.array([]))
    lengths = {r.size for r in rows}
    if len(lengths) > 1:
        max_len = max(lengths)
        X = np.zeros((len(rows), max_len), dtype=float)
        for i, r in enumerate(rows):
            X[i, : r.size] = r
        return X
    return np.vstack(rows) if rows else np.empty((0, 0))


def prepare_data_gmm_bilstm(df: pd.DataFrame, col_name: str = "cqcc") -> pd.DataFrame:
    """Drop null feature cells, transpose each CQCC cell to time-major."""
    from audioanalysisdetector_tpu.frontend.cqcc import transpose_cqcc

    df = filtr_nan(df, col_name).copy()
    df[col_name] = df[col_name].map(lambda x: np.asarray(transpose_cqcc(np.asarray(x))))
    return df
