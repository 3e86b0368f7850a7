"""Dataset assembly: duration probing, 2-s chunking, balancing, sampling.

Counterparts of ``prepare_dataframe`` (reference/ASV_dl_func.py:247-340) and
``prepare_dirs_dataset`` (:165-244): every audio file is probed (header-only,
no decode), files shorter than the chunk length are skipped with a warning,
and one row per full chunk is emitted with ``chunk_index/chunk_start/
chunk_end``. Per-class balancing downsamples to the minimum class subject to
minimum-count thresholds; rescue CSVs snapshot the expensive scan.
"""

from __future__ import annotations

import os
import wave

import pandas as pd

from audioanalysisdetector_tpu.data.metadata import prepare_filepaths, read_metadata
from audioanalysisdetector_tpu.io.audio import audio_info


def chunk_rows(
    df: pd.DataFrame,
    *,
    path_col: str = "file_path",
    chunk_seconds: float = 2.0,
    verbose: bool = True,
) -> pd.DataFrame:
    """Expand file rows into fixed-length chunk rows (skip short/unreadable)."""
    rows = []
    for _, row in df.iterrows():
        fpath = row[path_col]
        try:
            info = audio_info(fpath)
        except (RuntimeError, OSError, EOFError, ValueError, wave.Error) as e:
            if verbose:
                print(f"WARNING: cannot read {fpath}: {e}")
            continue
        duration = info.duration
        if duration < chunk_seconds:
            if verbose:
                print(f"too short: {fpath}")
            continue
        for i in range(int(duration // chunk_seconds)):
            new_row = row.copy()
            new_row["chunk_index"] = i
            new_row["chunk_start"] = i * chunk_seconds
            new_row["chunk_end"] = (i + 1) * chunk_seconds
            rows.append(new_row)
    return pd.DataFrame(rows).reset_index(drop=True) if rows else pd.DataFrame()


def _balance_downsample(
    df: pd.DataFrame, min_per_class: int, *, label_col: str = "label", seed: int = 42
) -> pd.DataFrame:
    counts = df[label_col].value_counts()
    if not (counts >= min_per_class).all():
        print(
            f"not enough data to balance (need >= {min_per_class} per class): "
            f"{counts.to_dict()}"
        )
        return df
    min_class = max(int(counts.min()), min_per_class)
    return (
        df.groupby(label_col, group_keys=False)[df.columns]
        .apply(lambda x: x.sample(min_class, random_state=seed))
        .reset_index(drop=True)
    )


def prepare_dataframe(
    all_data: dict,
    *,
    balance: bool = True,
    sample_size: int | None = 2000,
    min_per_class: int = 400,
    df_train: pd.DataFrame | None = None,
    chunk_seconds: float = 2.0,
    extension: str = ".flac",
    rescue_dir: str | None = ".",
    seed: int = 42,
) -> pd.DataFrame:
    """Assemble a chunked dataset from dataset config blocks.

    ``all_data`` maps dataset keys to ``{"metadata": path, "flac": [dirs]}``
    (the reference's config schema). When ``df_train`` is given, its file
    paths are excluded (held-out test assembly) and sampling caps are skipped.
    """
    dfs = []
    existing = (
        set(df_train["file_path"].unique())
        if df_train is not None and "file_path" in df_train.columns
        else set()
    )
    for key, value in all_data.items():
        metadata_path = value["metadata"]
        try:  # one parse per key, not per audio folder
            meta_df = read_metadata(metadata_path)
        except FileNotFoundError:
            print(f"WARNING: metadata file not found: {metadata_path}")
            continue
        key_chunks = []  # rescue snapshot accumulates across ALL folders of a key
        for audio_folder in value["flac"]:
            df = prepare_filepaths(meta_df, audio_folder, extension=extension)
            if df.empty:
                continue
            if existing:
                df = df[~df["file_path"].isin(existing)]
            df = chunk_rows(df, chunk_seconds=chunk_seconds)
            if df.empty:
                continue
            print(f"found {df.shape[0]} {chunk_seconds}-s chunks for {key}")
            key_chunks.append(df)
            if balance and "label" in df.columns:
                df = _balance_downsample(df, min_per_class, seed=seed)
            if df_train is None and sample_size:
                df = df.sample(min(len(df), sample_size), random_state=seed).copy()
            dfs.append(df)
        if rescue_dir is not None and key_chunks:
            pd.concat(key_chunks, ignore_index=True).to_csv(
                os.path.join(rescue_dir, f"{key}_ratunkowe.csv")
            )
    if not dfs:
        print("ERROR: no data loaded; check paths and config")
        return pd.DataFrame()
    return pd.concat(dfs, ignore_index=True, join="inner")


def prepare_dirs_dataset(
    dir_path: str,
    *,
    balance: bool = True,
    min_per_class: dict[str, int] | None = None,
    sample_size: int | None = 5000,
    chunk_seconds: float = 2.0,
    rescue_dir: str | None = ".",
    seed: int = 42,
) -> list[pd.DataFrame]:
    """Chunked datasets from ``dir/{train,val,test}/{label}/file`` layouts
    ("in the wild" data, reference/ASV_dl_func.py:165-244)."""
    if min_per_class is None:
        min_per_class = {"train": 300, "val": 10, "test": 5}
    dfs = []
    subsets = [
        d for d in sorted(os.listdir(dir_path)) if os.path.isdir(os.path.join(dir_path, d))
    ]
    for subset in subsets:
        set_path = os.path.join(dir_path, subset)
        records = []
        for label in sorted(os.listdir(set_path)):
            label_path = os.path.join(set_path, label)
            if not os.path.isdir(label_path):
                continue
            for file in sorted(os.listdir(label_path)):
                records.append([subset, os.path.join(label_path, file), label])
        df = pd.DataFrame(records, columns=["set", "filepath", "label"])
        df = chunk_rows(df, path_col="filepath", chunk_seconds=chunk_seconds)
        if df.empty:
            print(f"no data in {subset}, skipping")
            continue
        if rescue_dir is not None:
            df.to_csv(os.path.join(rescue_dir, f"{subset}_ratunkowe.csv"), index=False)
        if balance:
            df = _balance_downsample(df, min_per_class.get(subset, 5), seed=seed)
        if sample_size and len(df) > sample_size:
            df = df.sample(sample_size, random_state=seed).copy()
        dfs.append(df)
    return dfs
