"""ASVspoof metadata ingestion (L2) — schema detection and path resolution.

Counterparts of ``detect_columns`` / ``prepare_filepaths``
(reference/ASV_dl_func.py:150-162, reference/train_fun.py:49-53): metadata
files are whitespace-separated with no header; the schema (LA/PA/DF) is
auto-detected by column count against the configured column lists.
"""

from __future__ import annotations

import os

import pandas as pd

from audioanalysisdetector_tpu.io.config import DEFAULT_COLUMNS


def detect_columns(
    metadata_path: str, schemas: dict[str, list[str]] | None = None
) -> list[str]:
    schemas = schemas or DEFAULT_COLUMNS
    preview = pd.read_csv(metadata_path, sep=r"\s+", header=None, nrows=5)
    n_cols = preview.shape[1]
    for cols in (schemas.get("DF"), schemas.get("PA"), schemas.get("LA")):
        if cols is not None and n_cols == len(cols):
            return list(cols)
    return [f"c{i}" for i in range(n_cols)]


def read_metadata(
    metadata_path: str, schemas: dict[str, list[str]] | None = None
) -> pd.DataFrame:
    cols = detect_columns(metadata_path, schemas)
    return pd.read_csv(
        metadata_path, sep=r"\s+", header=None, names=cols, on_bad_lines="warn"
    )


def prepare_filepaths(
    df: pd.DataFrame,
    audio_folder: str,
    *,
    file_id_col: str = "file_id",
    extension: str = ".flac",
) -> pd.DataFrame:
    """Resolve ``file_id`` to existing audio paths; drop missing files.

    ``extension`` defaults to the reference's ``.flac``; pass ``".wav"`` for
    WAV corpora (this build decodes WAV natively, FLAC via optional soundfile).
    """
    df = df.copy()
    df["file_name"] = df[file_id_col].astype(str) + extension
    df["file_path"] = df["file_name"].map(lambda x: os.path.join(audio_folder, x))
    return df[df["file_path"].map(os.path.exists)].reset_index(drop=True)
