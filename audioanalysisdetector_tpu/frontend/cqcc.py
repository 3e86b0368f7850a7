"""CQCC — constant-Q cepstral coefficients (the reference's flagship feature).

Reproduces the exact chain of ``extract_cqcc`` (reference/ASV_dl_func.py:442-481):

  CQT magnitude -> ``amplitude_to_db(ref=max)`` (per utterance)
  -> per-frame re-interpolation of the geometric frequency grid onto a LINEAR
     grid of the same size (scipy ``interp1d(kind='linear')`` in the canonical
     copy — reference/ASV_dl_func.py:467; the cubic variant in older copies is
     intentionally not used)
  -> ``log(x**2 + 1e-12)`` applied to the *dB* values (a reference quirk,
     preserved as part of the numeric contract)
  -> orthonormal DCT-II over the frequency axis, keep first ``n_ceps=19`` rows.

For a 2-s 16 kHz chunk with hop 512 the output is ``(19, 63)`` — the shape
contract every downstream model relies on.

TPU-first: the linear re-interpolation is a fixed sparse operator, precomputed
host-side as a dense ``(n_bins, n_bins)`` matrix and applied as one GEMM; the
DCT is likewise a GEMM. Everything is batched and jit-safe.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from audioanalysisdetector_tpu.frontend.cqt import CQTConfig, cqt, cqt_frequencies
from audioanalysisdetector_tpu.frontend.db import amplitude_to_db
from audioanalysisdetector_tpu.frontend.dct import dct_ii


@lru_cache(maxsize=None)
def _linear_regrid_matrix(n_bins: int, fmin: float, bins_per_octave: int) -> np.ndarray:
    """(n_bins, n_bins) matrix mapping geometric-grid values to a linear grid.

    Row i holds the two interpolation weights for linear target frequency i.
    End points coincide with the source grid, so no extrapolation occurs.
    """
    src = cqt_frequencies(n_bins, fmin, bins_per_octave)
    dst = np.linspace(src.min(), src.max(), num=n_bins)
    W = np.zeros((n_bins, n_bins))
    idx = np.searchsorted(src, dst, side="right") - 1
    idx = np.clip(idx, 0, n_bins - 2)
    frac = (dst - src[idx]) / (src[idx + 1] - src[idx])
    rows = np.arange(n_bins)
    W[rows, idx] = 1.0 - frac
    W[rows, idx + 1] = frac
    return W


@dataclass(frozen=True)
class CQCCConfig:
    cqt: CQTConfig = field(default_factory=CQTConfig)
    n_ceps: int = 19

    @staticmethod
    def for_sr(sr: int, hop_length: int = 512, n_ceps: int = 19) -> "CQCCConfig":
        return CQCCConfig(cqt=CQTConfig.for_sr(sr, hop_length), n_ceps=n_ceps)


def cqcc_from_cqt_mag(mag: jnp.ndarray, cfg: CQCCConfig = CQCCConfig()) -> jnp.ndarray:
    """CQCC from a magnitude CQT ``(..., n_bins, T)`` -> ``(..., n_ceps, T)``."""
    c = cfg.cqt
    db = amplitude_to_db(mag, ref="max", utt_axes=2)
    W = jnp.asarray(
        _linear_regrid_matrix(c.n_bins, c.fmin, c.bins_per_octave), dtype=mag.dtype
    )
    interp = jnp.einsum("ij,...jt->...it", W, db)
    log_power = jnp.log(interp * interp + 1e-12)
    return dct_ii(log_power, axis=-2, n_out=cfg.n_ceps)


def cqcc(y: jnp.ndarray, cfg: CQCCConfig = CQCCConfig()) -> jnp.ndarray:
    """CQCC of ``(..., n)`` waveforms -> ``(..., n_ceps, T)`` (19, 63 for 2 s)."""
    return cqcc_from_cqt_mag(cqt(y, cfg.cqt), cfg)


def transpose_cqcc(feat: jnp.ndarray) -> jnp.ndarray:
    """(…, n_ceps, T) -> (…, T, n_ceps): time-major layout for sequence models
    (the reference's ``transpose_cqcc``, reference/ASV_dl_func.py:1052-1062)."""
    return jnp.swapaxes(feat, -1, -2)
