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
    """Number of STFT frames for a signal of static length ``n_samples``.

    Exactly ``frame_signal``'s count — for odd ``n_fft`` the center padding
    is ``2 * (n_fft // 2) = n_fft - 1``, so the popular ``1 + n // hop``
    shortcut is one off there."""
    padded = n_samples + 2 * (n_fft // 2) if center else n_samples
    if padded < n_fft:
        raise ValueError(
            f"signal of {n_samples} samples is shorter than one {n_fft}-point "
            f"frame (center={center})"
        )
    return 1 + (padded - n_fft) // hop_length


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
    if n < n_fft:
        # librosa raises here too; a silent (..., 0, n_fft) result would
        # propagate empty GEMMs far downstream before anything complains
        raise ValueError(
            f"signal of {n} samples (after padding) is shorter than one "
            f"{n_fft}-point frame"
        )
    num = 1 + (n - n_fft) // hop_length
    idx = np.arange(num)[:, None] * hop_length + np.arange(n_fft)[None, :]
    return y[..., idx]


@lru_cache(maxsize=None)
def _block_dft_bases(n_fft: int, hop: int) -> tuple[np.ndarray, ...]:
    """Bases for the hop-block DFT decomposition (see power_spectrogram).

    Returns (Wc, Ws) of shape (hop, n_fft//2+1) — the zero-padded block DFT
    at full n_fft resolution — and (cre, cim) of shape (J, n_fft//2+1), the
    frame-combination coefficients ``e^{-2πi j k / J}`` (J = n_fft // hop).
    """
    F = n_fft // 2 + 1
    m = np.arange(hop)[:, None]
    k = np.arange(F)[None, :]
    ang = 2.0 * np.pi * m * k / n_fft
    Wc = np.cos(ang).astype(np.float32)
    Ws = (-np.sin(ang)).astype(np.float32)
    J = n_fft // hop
    j = np.arange(J)[:, None]
    cang = 2.0 * np.pi * j * np.arange(F)[None, :] / J
    cre = np.cos(cang).astype(np.float32)
    cim = (-np.sin(cang)).astype(np.float32)
    return Wc, Ws, cre, cim


def _block_power_spectrogram(
    y: jnp.ndarray, *, n_fft: int, hop_length: int, pad_mode: str
) -> jnp.ndarray:
    """|STFT|² via shared hop-block DFTs — a MEASURED-AND-REJECTED alternative.

    Overlapping frames (n_fft = J·hop) share their hop-aligned blocks: the
    length-hop block DFTs at n_fft resolution are computed ONCE per block
    (one (·, hop) @ (hop, F) GEMM — n_fft/hop times fewer MACs than the
    per-frame direct DFT), each frame then combines its J blocks with the
    ``e^{-2πi jk/J}`` twiddles (elementwise), and the periodic-Hann window
    is applied spectrally as the circular 3-tap ``0.5X[k] − 0.25X[k−1] −
    0.25X[k+1]`` (edge taps via conjugate symmetry of the real-input DFT).

    Engineering record (2026-08, TPU v5e, batch 8192 × 2 s): despite 3.7×
    fewer GEMM FLOPs this measures 87.6 ms vs the direct matmul's 47.8 ms —
    the J overlapping combine/window passes over the (B, blocks, F)
    intermediates are HBM-bound and XLA cannot fuse the overlapping slices
    into one pass. (A four-step factorized DFT was also prototyped and
    measured: 120-135 ms — small-K GEMMs underutilize the 128×128 MXU and
    the complex intermediates spill to HBM.) The direct windowed-DFT GEMM
    runs at ~91 TF/s (~70% of this runtime's f32 peak) and stays the
    default. Numerics caveat: exact in exact arithmetic, but the unwindowed
    block spectra carry rectangular-window leakage, so in f32 the spectral
    3-tap cancellation costs small bins relative precision (measured ≤0.3%
    of peak power on noise+tone inputs vs the direct path).
    """
    J = n_fft // hop_length
    F = n_fft // 2 + 1
    pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
    ypad = jnp.pad(y, pad, mode=pad_mode)
    n_frames = 1 + y.shape[-1] // hop_length
    n_blocks = n_frames - 1 + J
    ypad = ypad[..., : n_blocks * hop_length]
    blocks = ypad.reshape(ypad.shape[:-1] + (n_blocks, hop_length))

    Wc, Ws, cre, cim = _block_dft_bases(n_fft, hop_length)
    g_re = blocks @ jnp.asarray(Wc, dtype=y.dtype)  # (..., n_blocks, F)
    g_im = blocks @ jnp.asarray(Ws, dtype=y.dtype)

    x_re = jnp.zeros(y.shape[:-1] + (n_frames, F), dtype=y.dtype)
    x_im = jnp.zeros_like(x_re)
    for j in range(J):
        gr = g_re[..., j : j + n_frames, :]
        gi = g_im[..., j : j + n_frames, :]
        cr = jnp.asarray(cre[j], dtype=y.dtype)
        ci = jnp.asarray(cim[j], dtype=y.dtype)
        x_re = x_re + cr * gr - ci * gi
        x_im = x_im + cr * gi + ci * gr

    # periodic Hann applied spectrally; edge neighbors X[-1] = conj(X[1]),
    # X[F] = conj(X[F-2]) (real input, even n_fft)
    re_ext = jnp.concatenate(
        [x_re[..., 1:2], x_re, x_re[..., F - 2 : F - 1]], axis=-1
    )
    im_ext = jnp.concatenate(
        [-x_im[..., 1:2], x_im, -x_im[..., F - 2 : F - 1]], axis=-1
    )
    w_re = 0.5 * x_re - 0.25 * (re_ext[..., :-2] + re_ext[..., 2:])
    w_im = 0.5 * x_im - 0.25 * (im_ext[..., :-2] + im_ext[..., 2:])
    return jnp.swapaxes(w_re * w_re + w_im * w_im, -1, -2)


def block_method_eligible(
    n_fft: int, hop_length: int, win_length: int | None, window: str, center: bool
) -> bool:
    return (
        center
        and window == "hann"
        and (win_length is None or win_length == n_fft)
        and n_fft % hop_length == 0
        and n_fft // hop_length >= 2
    )


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
    if method == "block":
        if not block_method_eligible(n_fft, hop_length, win_length, window, center):
            raise ValueError(
                "block method needs center=True, hann, win_length == n_fft, "
                "and hop_length dividing n_fft"
            )
        mag2 = _block_power_spectrogram(
            y, n_fft=n_fft, hop_length=hop_length, pad_mode=pad_mode
        )
        mag2 = jnp.swapaxes(mag2, -1, -2)  # back to (..., T, F) for the tail
    elif method == "matmul":
        frames = frame_signal(y, n_fft=n_fft, hop_length=hop_length, center=center, pad_mode=pad_mode)
        cos_b, sin_b = _rdft_bases(n_fft, window, win_length)
        re = frames @ jnp.asarray(cos_b)
        im = frames @ jnp.asarray(sin_b)
        mag2 = re * re + im * im
    elif method == "fft":
        frames = frame_signal(y, n_fft=n_fft, hop_length=hop_length, center=center, pad_mode=pad_mode)
        w = jnp.asarray(_window_array(window, win_length, n_fft), dtype=y.dtype)
        spec = jnp.fft.rfft(frames * w, axis=-1)
        mag2 = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    else:
        # a typo'd method must fail HERE, not route to the FFT path (which
        # is UNIMPLEMENTED on some TPU runtimes and dies far away)
        raise ValueError(f"unknown stft method {method!r}")
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
