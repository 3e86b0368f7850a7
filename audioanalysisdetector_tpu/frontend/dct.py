"""Orthonormal DCT-II as a matmul basis (MXU-friendly).

scipy.fftpack.dct(type=2, norm='ortho') — used by the reference for CQCC
(reference/ASV_dl_func.py:471) and implicitly by librosa.feature.mfcc — is
realized on TPU as a precomputed basis matrix applied with a GEMM.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def dct_ii_matrix(n: int, n_out: int | None = None) -> np.ndarray:
    """Orthonormal DCT-II matrix ``(n_out, n)``: ``c = M @ x``.

    ``M[k, j] = s_k * cos(pi * k * (2j + 1) / (2n))`` with
    ``s_0 = sqrt(1/n)``, ``s_k = sqrt(2/n)`` for k > 0.
    """
    n_out = n if n_out is None else n_out
    k = np.arange(n_out)[:, None]
    j = np.arange(n)[None, :]
    M = np.cos(np.pi * k * (2.0 * j + 1.0) / (2.0 * n))
    M *= np.sqrt(2.0 / n)
    M[0] *= np.sqrt(0.5)
    return M


def dct_ii(x: jnp.ndarray, *, axis: int = -2, n_out: int | None = None) -> jnp.ndarray:
    """Orthonormal DCT-II along ``axis``, optionally truncated to ``n_out``."""
    n = x.shape[axis]
    M = jnp.asarray(dct_ii_matrix(n, n_out), dtype=x.dtype)
    x_moved = jnp.moveaxis(x, axis, -1)
    out = x_moved @ M.T
    return jnp.moveaxis(out, -1, axis)
