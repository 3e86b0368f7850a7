"""Inverse STFT (overlap-add), matmul-based — supports the phase vocoder.

Matches the forward conventions in ``stft.py``: periodic Hann, centered
frames, hop/4 overlap by default. The inverse real DFT per frame is a GEMM
against precomputed cos/sin bases (no FFT dependency on TPU runtimes).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from audioanalysisdetector_tpu.frontend.stft import _window_array


@lru_cache(maxsize=None)
def _irdft_bases(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Bases s.t. ``frame = Re @ C.T + Im @ S.T`` for an rDFT of size n_fft."""
    k = np.arange(n_fft // 2 + 1)[None, :]
    n = np.arange(n_fft)[:, None]
    ang = 2.0 * np.pi * n * k / n_fft
    scale = np.full(n_fft // 2 + 1, 2.0)
    scale[0] = 1.0
    if n_fft % 2 == 0:
        scale[-1] = 1.0
    C = (np.cos(ang) * scale[None, :] / n_fft).astype(np.float32)  # (n_fft, F)
    S = (-np.sin(ang) * scale[None, :] / n_fft).astype(np.float32)
    return C, S


def istft(
    spec_re: jnp.ndarray,
    spec_im: jnp.ndarray,
    *,
    n_fft: int = 2048,
    hop_length: int = 512,
    window: str = "hann",
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse STFT of ``(..., F, T)`` re/im parts -> ``(..., n)`` waveforms.

    Windowed overlap-add with squared-window normalization (librosa/torch
    semantics); assumes the forward used ``center=True``.
    """
    C, S = _irdft_bases(n_fft)
    w = _window_array(window, n_fft, n_fft).astype(np.float32)
    # frames: (..., T, n_fft)
    re_t = jnp.swapaxes(spec_re, -1, -2)
    im_t = jnp.swapaxes(spec_im, -1, -2)
    frames = re_t @ jnp.asarray(C.T) + im_t @ jnp.asarray(S.T)
    frames = frames * jnp.asarray(w)

    T = frames.shape[-2]
    out_len = n_fft + (T - 1) * hop_length
    lead = frames.shape[:-2]
    sig = jnp.zeros(lead + (out_len,), dtype=frames.dtype)
    norm = np.zeros(out_len, dtype=np.float32)
    # scatter-add via precomputed index map (static shapes)
    idx = (np.arange(T)[:, None] * hop_length + np.arange(n_fft)[None, :]).reshape(-1)
    flat = frames.reshape(lead + (T * n_fft,))
    sig = sig.at[..., idx].add(flat)
    np.add.at(norm, idx.reshape(T, n_fft), (w * w)[None, :])
    sig = sig / jnp.asarray(np.maximum(norm, 1e-8))
    # undo center padding
    sig = sig[..., n_fft // 2 :]
    if length is not None:
        sig = sig[..., :length]
        pad = length - sig.shape[-1]
        if pad > 0:
            sig = jnp.pad(sig, [(0, 0)] * (sig.ndim - 1) + [(0, pad)])
    else:
        sig = sig[..., : out_len - n_fft]
    return sig
