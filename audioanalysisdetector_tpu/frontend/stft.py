"""Batched short-time Fourier transform with librosa-parity semantics.

The reference reaches STFT through ``librosa.feature.melspectrogram`` /
``librosa.feature.mfcc`` (reference/ASV_dl_func.py:416, 533). librosa's
conventions, reproduced here:

- ``center=True``: the signal is padded by ``n_fft // 2`` on both sides with
  reflection, so frame ``t`` is centered at sample ``t * hop_length``.
- the window is a periodic Hann of ``win_length`` samples, zero-padded
  symmetrically to ``n_fft``.
- output layout is ``(..., n_freqs, n_frames)`` (frequency-major), matching
  the reference's downstream axis conventions.

TPU-first design notes
----------------------
Everything is static-shape and jit-friendly: the number of frames is a Python
int derived from the (static) signal length. Two spectrum paths are provided:

- ``method="fft"``: ``jnp.fft.rfft`` over gathered frames (XLA FFT).
- ``method="matmul"``: the DFT as two real matmuls against precomputed
  cos/sin bases with the window fused in. On TPU this rides the MXU and
  fuses with a following mel projection into a chain of GEMMs.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from audioanalysisdetector_tpu.frontend.windows import get_window, pad_center


def n_frames_for(n_samples: int, hop_length: int, n_fft: int, center: bool) -> int:
    """Number of STFT frames for a signal of static length ``n_samples``."""
    if center:
        return 1 + n_samples // hop_length
    return 1 + (n_samples - n_fft) // hop_length


@lru_cache(maxsize=None)
def _window_array(window: str, win_length: int, n_fft: int) -> np.ndarray:
    return pad_center(get_window(window, win_length, periodic=True), n_fft)


@lru_cache(maxsize=None)
def _rdft_bases(n_fft: int, window: str, win_length: int) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT cos/sin bases, each ``(n_fft, n_fft // 2 + 1)`` f32."""
    w = _window_array(window, win_length, n_fft)
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    cos_b = (np.cos(ang) * w[:, None]).astype(np.float32)
    sin_b = (-np.sin(ang) * w[:, None]).astype(np.float32)
    return cos_b, sin_b


def frame_signal(
    y: jnp.ndarray,
    *,
    n_fft: int,
    hop_length: int,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Slice ``(..., n)`` waveforms into ``(..., n_frames, n_fft)`` frames."""
    if center:
        pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        y = jnp.pad(y, pad, mode=pad_mode)
    n = y.shape[-1]
    num = 1 + (n - n_fft) // hop_length
    idx = np.arange(num)[:, None] * hop_length + np.arange(n_fft)[None, :]
    return y[..., idx]


def stft(
    y: jnp.ndarray,
    *,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: int | None = None,
    window: str = "hann",
    center: bool = True,
    pad_mode: str = "reflect",
    method: str = "fft",
) -> jnp.ndarray:
    """Complex STFT of ``(..., n)`` signals -> ``(..., n_fft//2+1, n_frames)``."""
    win_length = n_fft if win_length is None else win_length
    frames = frame_signal(y, n_fft=n_fft, hop_length=hop_length, center=center, pad_mode=pad_mode)
    if method == "fft":
        w = jnp.asarray(_window_array(window, win_length, n_fft), dtype=y.dtype)
        spec = jnp.fft.rfft(frames * w, axis=-1)
    elif method == "matmul":
        cos_b, sin_b = _rdft_bases(n_fft, window, win_length)
        re = frames @ jnp.asarray(cos_b)
        im = frames @ jnp.asarray(sin_b)
        spec = jax_complex(re, im)
    else:
        raise ValueError(f"unknown stft method {method!r}")
    return jnp.swapaxes(spec, -1, -2)


def power_spectrogram(
    y: jnp.ndarray,
    *,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: int | None = None,
    window: str = "hann",
    center: bool = True,
    pad_mode: str = "reflect",
    power: float = 2.0,
    method: str = "matmul",
) -> jnp.ndarray:
    """|STFT|**power without materializing a complex array (matmul path).

    Returns ``(..., n_fft//2+1, n_frames)``. The default matmul method keeps
    the whole frontend on the MXU: frames @ cos/sin bases, square, add.
    """
    win_length = n_fft if win_length is None else win_length
    frames = frame_signal(y, n_fft=n_fft, hop_length=hop_length, center=center, pad_mode=pad_mode)
    if method == "matmul":
        cos_b, sin_b = _rdft_bases(n_fft, window, win_length)
        re = frames @ jnp.asarray(cos_b)
        im = frames @ jnp.asarray(sin_b)
        mag2 = re * re + im * im
    else:
        w = jnp.asarray(_window_array(window, win_length, n_fft), dtype=y.dtype)
        spec = jnp.fft.rfft(frames * w, axis=-1)
        mag2 = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    if power == 2.0:
        out = mag2
    elif power == 1.0:
        out = jnp.sqrt(mag2)
    else:
        out = mag2 ** (power / 2.0)
    return jnp.swapaxes(out, -1, -2)


def jax_complex(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    return re + 1j * im


def stft_realimag(
    y: jnp.ndarray,
    *,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: int | None = None,
    window: str = "hann",
    center: bool = True,
    pad_mode: str = "reflect",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """STFT as separate (re, im) real arrays, each ``(..., F, T)``.

    Complex dtypes are unimplemented on some TPU runtimes; this matmul-DFT
    path never materializes one (used by the phase vocoder).
    """
    win_length = n_fft if win_length is None else win_length
    frames = frame_signal(y, n_fft=n_fft, hop_length=hop_length, center=center, pad_mode=pad_mode)
    cos_b, sin_b = _rdft_bases(n_fft, window, win_length)
    re = frames @ jnp.asarray(cos_b, dtype=y.dtype)
    im = frames @ jnp.asarray(sin_b, dtype=y.dtype)
    return jnp.swapaxes(re, -1, -2), jnp.swapaxes(im, -1, -2)
