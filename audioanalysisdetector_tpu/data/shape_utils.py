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
        # ragged nested list: numpy >= 1.24 raises here AND on the old
        # [x]-wrap fallback — recursive flatten is the working path
        return np.asarray(list(_flatten(x)), dtype=float)
    if arr.dtype == object:
        # ragged nested cells (numpy >= 1.24 refuses implicit object
        # arrays only sometimes — when it doesn't, ravel would keep
        # sub-lists as elements): flatten recursively instead
        return np.asarray(list(_flatten(x)), dtype=float)
    return np.ravel(arr)


def _flatten(v):
    if isinstance(v, (list, tuple, np.ndarray)):
        for item in v:
            yield from _flatten(item)
    else:
        yield float(v)


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
    df = filtr_nan(df, col_name).copy()
    # host numpy per cell — transpose_cqcc is a jnp op, and an eager jnp
    # call PER ROW is one tunnel dispatch + fetch each on remote TPU
    # runtimes (CLAUDE.md); a host swapaxes is the identical contract
    df[col_name] = df[col_name].map(lambda x: np.swapaxes(np.asarray(x), -1, -2))
    return df
