"""MFCC + delta features + CMVN (librosa-parity, batched, MXU-friendly).

The reference's MFCC is ``librosa.feature.mfcc(y, sr, n_mfcc=13)``
(reference/ASV_dl_func.py:416) with librosa defaults: 128-mel power
spectrogram -> ``power_to_db`` (ref=1, top_db=80 — the clip is still
relative to the per-utterance max) -> orthonormal DCT-II over the mel axis
-> first ``n_mfcc`` rows.

Deltas follow ``librosa.feature.delta`` semantics (Savitzky-Golay,
``width=9``, ``mode='interp'``). Because the sequence length is static under
jit, the whole SG filter — interior taps and polynomial edge handling — is
folded into one precomputed ``(T, T)`` matrix, applied as a GEMM.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from audioanalysisdetector_tpu.frontend.db import power_to_db
from audioanalysisdetector_tpu.frontend.dct import dct_ii
from audioanalysisdetector_tpu.frontend.mel import MelConfig, melspectrogram


@dataclass(frozen=True)
class MFCCConfig:
    n_mfcc: int = 13
    mel: MelConfig = field(default_factory=lambda: MelConfig(n_mels=128))
    # librosa.feature.mfcc dB settings (power_to_db defaults)
    ref: float | str = 1.0
    top_db: float | None = 80.0

    @staticmethod
    def for_sr(sr: int, n_mfcc: int = 13) -> "MFCCConfig":
        return MFCCConfig(n_mfcc=n_mfcc, mel=MelConfig(sr=sr, n_mels=128))


def mfcc(y: jnp.ndarray, cfg: MFCCConfig = MFCCConfig()) -> jnp.ndarray:
    """MFCCs of ``(..., n)`` waveforms -> ``(..., n_mfcc, T)``."""
    S = power_to_db(melspectrogram(y, cfg.mel), ref=cfg.ref, top_db=cfg.top_db, utt_axes=2)
    return dct_ii(S, axis=-2, n_out=cfg.n_mfcc)


@lru_cache(maxsize=None)
def _savgol_delta_matrix(t: int, width: int, order: int) -> np.ndarray:
    """(t, t) matrix M with ``delta(x) = x @ M.T`` along a time axis of length t.

    Equals ``scipy.signal.savgol_filter(I, width, polyorder=order,
    deriv=order, mode='interp')`` applied column-wise — SG filtering is
    linear, so filtering the identity yields the exact operator, including
    'interp' edge behavior.
    """
    from scipy.signal import savgol_filter

    eye = np.eye(t)
    # filter each standard basis vector; column j of the operator
    out = savgol_filter(eye, width, polyorder=order, deriv=order, axis=0, mode="interp")
    return out.astype(np.float64)


def delta(x: jnp.ndarray, *, width: int = 9, order: int = 1, axis: int = -1) -> jnp.ndarray:
    """librosa-parity delta features along ``axis`` (static length)."""
    t = x.shape[axis]
    if t < width:
        raise ValueError(f"sequence length {t} shorter than SG width {width}")
    M = jnp.asarray(_savgol_delta_matrix(t, width, order), dtype=x.dtype)
    x_moved = jnp.moveaxis(x, axis, -1)
    out = x_moved @ M.T
    return jnp.moveaxis(out, -1, axis)


def add_deltas(feat: jnp.ndarray, *, width: int = 9, axis: int = -1) -> jnp.ndarray:
    """Stack [feat; delta; delta-delta] along the coefficient axis (-2)."""
    d1 = delta(feat, width=width, order=1, axis=axis)
    d2 = delta(feat, width=width, order=2, axis=axis)
    return jnp.concatenate([feat, d1, d2], axis=-2)


def cmvn(
    feat: jnp.ndarray, *, axis: int = -1, variance: bool = True, eps: float = 1e-8
) -> jnp.ndarray:
    """Per-utterance cepstral mean (and variance) normalization over ``axis``."""
    mean = jnp.mean(feat, axis=axis, keepdims=True)
    out = feat - mean
    if variance:
        std = jnp.sqrt(jnp.var(feat, axis=axis, keepdims=True) + eps)
        out = out / std
    return out


def mfcc_deltas_cmvn(
    y: jnp.ndarray, cfg: MFCCConfig = MFCCConfig(), *, width: int = 9
) -> jnp.ndarray:
    """BASELINE config #2: MFCC + delta/delta-delta + per-utterance CMVN.

    ``(..., n) -> (..., 3 * n_mfcc, T)``.
    """
    feat = mfcc(y, cfg)
    feat = add_deltas(feat, width=width, axis=-1)
    return cmvn(feat, axis=-1)
