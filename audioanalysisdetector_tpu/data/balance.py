"""Class balancing + the row-level augmentation expansion policy.

- ``balance_upsample``: minority upsampled with replacement to match the
  majority (reference ``balance_func``, reference/ASV_dl_func.py:1074-1088).
- ``balance_downsample``: majority downsampled without replacement. The
  reference's ``downsampled_dataset`` compares DataFrames with ``<``
  (reference/ASV_dl_func.py:132 — a crash for any non-empty input); this is
  the corrected behavior it evidently intended.
- ``add_data_augmentation``: the 0.8 / 0.5 oversampling policy
  (reference/ASV_dl_func.py:96-127): with p=0.8 append one copy with a
  random augmentation; with p=0.5 append one copy per augmentation of a
  random 2-element augmentation pair. The augmentation is stored in a
  column and applied lazily on-device (data/augment.py).
"""

from __future__ import annotations

import random as _random

import numpy as np
import pandas as pd


def _resample_with_replacement(df: pd.DataFrame, n: int, seed: int) -> pd.DataFrame:
    idx = np.random.default_rng(seed).integers(0, len(df), n)
    return df.iloc[idx]


def balance_upsample(df: pd.DataFrame, col_name: str = "label_num", *, seed: int = 42) -> pd.DataFrame:
    df0 = df[df[col_name] == 0]
    df1 = df[df[col_name] == 1]
    if df0.empty or df1.empty:
        # e.g. every row of one class dropped by decode failure + filtr_nan
        # — rng.integers(0, 0) would raise a cryptic 'low >= high' instead
        raise ValueError(
            f"balance_upsample: class {'0' if df0.empty else '1'} has no rows"
        )
    if len(df0) > len(df1):
        df1 = _resample_with_replacement(df1, len(df0), seed)
    else:
        df0 = _resample_with_replacement(df0, len(df1), seed)
    return pd.concat([df0, df1]).reset_index(drop=True)


def balance_downsample(df: pd.DataFrame, col_name: str = "label_num", *, seed: int = 42) -> pd.DataFrame:
    df0 = df[df[col_name] == 0]
    df1 = df[df[col_name] == 1]
    minority, majority = (df0, df1) if len(df0) < len(df1) else (df1, df0)
    down = majority.sample(len(minority), replace=False, random_state=seed)
    return pd.concat([down, minority]).reset_index(drop=True)


def filtr_nan(df: pd.DataFrame, col_name: str = "cqcc") -> pd.DataFrame:
    """Drop rows whose feature cell is null (reference/ASV_dl_func.py:1065-1071)."""
    initial = len(df)
    out = df[df[col_name].notnull()]
    if len(out) < initial:
        print(f"dropped {initial - len(out)} rows with empty {col_name}")
    return out


def add_data_augmentation(
    df: pd.DataFrame,
    col_name: str = "augmentationType",
    aug_type: list[str] | None = None,
    *,
    seed: int | None = None,
) -> pd.DataFrame:
    """Row-level augmentation oversampling, the reference's exact policy."""
    if aug_type is None:
        aug_type = ["change pitch", "noise"]
    rng = _random.Random(seed)
    df = df.copy()
    df[col_name] = None
    extra_rows = []
    for _, row in df.iterrows():
        if rng.random() < 0.8:
            row_copy = row.copy()
            row_copy[col_name] = rng.choice(aug_type)
            extra_rows.append(row_copy)
        if rng.random() < 0.5 and len(aug_type) > 1:
            for aug in rng.sample(aug_type, 2):
                row_copy = row.copy()
                row_copy[col_name] = aug
                extra_rows.append(row_copy)
    if extra_rows:
        return pd.concat([df, pd.DataFrame(extra_rows)], ignore_index=True)
    return df
