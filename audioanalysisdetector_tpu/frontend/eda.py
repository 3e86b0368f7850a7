"""EDA-notebook spectrogram variants.

Counterparts of the exploration notebook's extractors: the high-resolution
CQT spectrogram (``compute_cqt_spec``: n_bins=108, bins_per_octave=36,
dB ref=max, per-utterance z-norm — ASV_dataset.ipynb cell 29) and the
z-normalized 128-mel spectrogram (n_fft=2048, hop=512 — cell 27).
"""

from __future__ import annotations

import jax.numpy as jnp

from audioanalysisdetector_tpu.frontend.cqt import C1_HZ, CQTConfig, cqt
from audioanalysisdetector_tpu.frontend.db import amplitude_to_db, power_to_db
from audioanalysisdetector_tpu.frontend.mel import MelConfig, melspectrogram


def znorm(x: jnp.ndarray, *, utt_axes: int = 2, eps: float = 1e-6) -> jnp.ndarray:
    """Per-utterance z-normalization over the trailing spectrogram axes."""
    axes = tuple(range(-utt_axes, 0))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    std = jnp.std(x, axis=axes, keepdims=True)
    return (x - mean) / (std + eps)


def compute_cqt_spec(
    y: jnp.ndarray,
    *,
    sr: int = 16000,
    hop_length: int = 512,
    n_bins: int = 108,
    bins_per_octave: int = 36,
    fmin: float = C1_HZ,
) -> jnp.ndarray:
    """(…, n) -> (…, 108, T): |CQT| -> dB(ref=max) -> z-norm."""
    cfg = CQTConfig(
        sr=sr, hop_length=hop_length, fmin=fmin,
        n_bins=n_bins, bins_per_octave=bins_per_octave,
    )
    mag = cqt(y, cfg)
    db = amplitude_to_db(mag, ref="max", utt_axes=2)
    return znorm(db)


def melspectrogram_znorm(
    y: jnp.ndarray,
    *,
    sr: int = 16000,
    n_mels: int = 128,
    n_fft: int = 2048,
    hop_length: int = 512,
) -> jnp.ndarray:
    """(…, n) -> (…, 128, T): mel power -> dB(ref=max) -> z-norm."""
    cfg = MelConfig(sr=sr, n_mels=n_mels, n_fft=n_fft, hop_length=hop_length)
    db = power_to_db(melspectrogram(y, cfg), ref="max", utt_axes=2)
    return znorm(db)
