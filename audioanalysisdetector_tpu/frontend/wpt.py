"""Wavelet-packet energies (db4, depth 3) — the reference's WPT feature.

``extract_wpt`` (reference/ASV_dl_func.py:502-519) computes
``pywt.WaveletPacket(data=y, wavelet='db4', mode='symmetric', maxlevel=3)``
and returns the mean squared energy of each of the 8 level-3 nodes in
*natural* order (depth-first, approximation child first).

pywt is not installed here; this is an independent implementation of the
Mallat cascade with pywt's conventions: half-sample symmetric extension
(edge sample repeated), full convolution subsampled at odd indices, output
length ``floor((n + L - 1) / 2)`` per level. Since the feature is per-subband
*energy*, it is insensitive to the residual phase-alignment details of any
particular DWT library.

TPU-first: each level is a 2-tap-stride conv against the fixed 8-tap db4
decomposition pair; depth 3 -> 14 small convs, all batched.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# db4 scaling (reconstruction low-pass) filter, standard published values.
_DB4_REC_LO = np.array(
    [
        0.23037781330885523,
        0.7148465705525415,
        0.6308807679295904,
        -0.02798376941698385,
        -0.18703481171888114,
        0.030841381835986965,
        0.032883011666982945,
        -0.010597401784997278,
    ]
)


@lru_cache(maxsize=None)
def db4_decomposition_filters() -> tuple[np.ndarray, np.ndarray]:
    """(dec_lo, dec_hi) pywt-convention decomposition pair for db4."""
    rec_lo = _DB4_REC_LO
    dec_lo = rec_lo[::-1].copy()
    # pywt QMF convention (even length): dec_hi[n] = (-1)**(n+1) * rec_lo[n]
    # (Haar check: rec_lo = [.707, .707] -> dec_hi = [-.707, .707], as pywt)
    dec_hi = rec_lo * (-1.0) ** (np.arange(len(rec_lo)) + 1)
    return dec_lo, dec_hi


def _dwt_level(x: jnp.ndarray, dec_lo: jnp.ndarray, dec_hi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One analysis level along the last axis: (..., n) -> 2 x (..., (n+L-1)//2)."""
    L = dec_lo.shape[-1]
    n = x.shape[-1]
    out_len = (n + L - 1) // 2
    ext = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(L - 1, L - 1)], mode="symmetric")
    ext = ext[..., 1:]  # pywt subsamples odd indices of the full convolution
    flat = ext.reshape((-1, 1) + ext.shape[-1:])
    # lax.conv is correlation; pass reversed filters to get convolution
    filt = jnp.stack([dec_lo[::-1], dec_hi[::-1]])[:, None, :].astype(x.dtype)
    out = jax.lax.conv_general_dilated(flat, filt, window_strides=(2,), padding="VALID")
    out = out[..., :out_len]
    out = out.reshape(x.shape[:-1] + (2, out.shape[-1]))
    return out[..., 0, :], out[..., 1, :]


def wavelet_packet_leaves(y: jnp.ndarray, *, level: int = 3) -> list[jnp.ndarray]:
    """All 2**level terminal nodes in natural order (depth-first, 'a' first)."""
    dec_lo, dec_hi = db4_decomposition_filters()
    lo = jnp.asarray(dec_lo, dtype=y.dtype)
    hi = jnp.asarray(dec_hi, dtype=y.dtype)

    def descend(x: jnp.ndarray, depth: int) -> list[jnp.ndarray]:
        if depth == 0:
            return [x]
        a, d = _dwt_level(x, lo, hi)
        return descend(a, depth - 1) + descend(d, depth - 1)

    return descend(y, level)


def wpt_energies(y: jnp.ndarray, *, level: int = 3) -> jnp.ndarray:
    """Mean squared energy of each terminal node: (..., n) -> (..., 2**level)."""
    leaves = wavelet_packet_leaves(y, level=level)
    return jnp.stack([jnp.mean(leaf * leaf, axis=-1) for leaf in leaves], axis=-1)
