"""Frame-level standardization (StandardScaler role), JAX-native.

The reference fits ``sklearn.StandardScaler`` on the vstack of all training
frames and applies it per feature cell, persisting with joblib
(reference/ASV_dl_func.py:1113-1129). Here the scaler is two arrays
(mean/std over the coefficient axis) that live on device and fold into the
jitted pipeline; persistence is npz (no pickle).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class FrameScaler:
    mean: np.ndarray  # (n_coeffs,)
    std: np.ndarray  # (n_coeffs,)

    @staticmethod
    def fit(frames: np.ndarray, *, eps: float = 0.0) -> "FrameScaler":
        """``frames``: (N, n_coeffs) stack of all training frames."""
        mean = frames.mean(axis=0)
        std = frames.std(axis=0)
        std = np.where(std == 0.0, 1.0, std) + eps  # sklearn's zero-var rule
        return FrameScaler(mean=mean.astype(np.float32), std=std.astype(np.float32))

    @staticmethod
    def fit_sequences(seqs: np.ndarray) -> "FrameScaler":
        """``seqs``: (B, T, n_coeffs) batch of time-major sequences."""
        return FrameScaler.fit(np.asarray(seqs).reshape(-1, seqs.shape[-1]))

    def transform(self, x: jnp.ndarray) -> jnp.ndarray:
        """Standardize ``(..., n_coeffs)`` frames (broadcasts over leading axes)."""
        return (x - jnp.asarray(self.mean)) / jnp.asarray(self.std)

    def inverse(self, x: jnp.ndarray) -> jnp.ndarray:
        return x * jnp.asarray(self.std) + jnp.asarray(self.mean)

    def save(self, path: str) -> None:
        np.savez(path, mean=self.mean, std=self.std)

    @staticmethod
    def load(path: str) -> "FrameScaler":
        with np.load(path) as z:
            return FrameScaler(mean=z["mean"], std=z["std"])


def prepare_train_test_data(
    train_seqs: np.ndarray,
    test_seqs: np.ndarray,
    *,
    scaler_path: str | None = None,
) -> tuple[np.ndarray, np.ndarray, FrameScaler]:
    """Fit on train frames, transform both (the reference's contract,
    reference/ASV_dl_func.py:1113-1129) — array-native."""
    scaler = FrameScaler.fit_sequences(train_seqs)
    tr = np.asarray(scaler.transform(jnp.asarray(train_seqs)))
    te = np.asarray(scaler.transform(jnp.asarray(test_seqs)))
    if scaler_path:
        scaler.save(scaler_path)
    return tr, te, scaler


def prepare_train_test_data_multi(
    train_df,
    test_df,
    feature_cols: list[str],
    *,
    model_dir: str | None = None,
) -> tuple:
    """Per-feature scalers over DataFrame cells (the reference's
    ``prepare_train_test_data_multi``, reference/ASV_dl_func.py:1090-1110):
    fit each feature's scaler on the vstack of its train cells, transform
    both splits in place, persist one npz per feature."""
    import os

    train_df = train_df.copy()
    test_df = test_df.copy()
    scalers: dict[str, FrameScaler] = {}
    for col in feature_cols:
        frames = np.vstack([np.asarray(v) for v in train_df[col]])
        scaler = FrameScaler.fit(frames)
        # plain host numpy per cell: an eager jnp round-trip here would be
        # one device dispatch + fetch PER CELL — hours at corpus scale on
        # tunneled TPU runtimes (CLAUDE.md), for millisecond arithmetic
        train_df[col] = [
            (np.asarray(v) - scaler.mean) / scaler.std for v in train_df[col]
        ]
        test_df[col] = [
            (np.asarray(v) - scaler.mean) / scaler.std for v in test_df[col]
        ]
        if model_dir:
            os.makedirs(model_dir, exist_ok=True)
            scaler.save(os.path.join(model_dir, f"{col}_scaler.npz"))
        scalers[col] = scaler
    return train_df, test_df, scalers
