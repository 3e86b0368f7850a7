"""On-device augmentation pipeline (BASELINE config #3).

The reference augments on the host inside the extractors
(``augment_audio``, reference/ASV_dl_func.py:78-93: pitch shift via
librosa's phase vocoder, additive Gaussian noise) and expands the dataset
row-wise (reference/ASV_dl_func.py:96-127). Here every augmentation is a
pure, batched, PRNG-keyed JAX function that runs inside the jitted input
pipeline: additive noise, time shift, phase-vocoder pitch shift, and
SpecAugment-style time/frequency masking on feature maps.

Note on defaults: the reference's noise default ``factor=1.022`` drowns the
signal (documented bug, SURVEY.md quirks); notebook usage passes 0.005,
which is the default here. The reference's pitch default ``n_steps=0.005``
(a 1/200 semitone — inaudible) is preserved as the API default.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from audioanalysisdetector_tpu.frontend.istft import istft
from audioanalysisdetector_tpu.frontend.stft import stft_realimag


def add_noise(wav: jnp.ndarray, key: jax.Array, *, factor: float = 0.005) -> jnp.ndarray:
    """``wav + factor * N(0, 1)`` — the reference's "noise" mode."""
    return wav + factor * jax.random.normal(key, wav.shape, wav.dtype)


def time_shift(wav: jnp.ndarray, key: jax.Array, *, max_frac: float = 0.1) -> jnp.ndarray:
    """Random circular shift per utterance, up to ``max_frac`` of the length."""
    n = wav.shape[-1]
    max_shift = max(int(n * max_frac), 1)
    batch_shape = wav.shape[:-1]
    shifts = jax.random.randint(key, batch_shape, -max_shift, max_shift + 1)
    idx = (jnp.arange(n)[None, :] - shifts.reshape(-1)[:, None]) % n
    flat = wav.reshape(-1, n)
    out = jnp.take_along_axis(flat, idx, axis=-1)
    return out.reshape(wav.shape)


@lru_cache(maxsize=None)
def _sinc_kernel(taps: int = 16) -> np.ndarray:
    # Hann-windowed sinc interpolator offsets (host constant)
    return np.arange(-taps // 2 + 1, taps // 2 + 1).astype(np.float32)


def resample_to(y: jnp.ndarray, n_out: int, *, taps: int = 16) -> jnp.ndarray:
    """Windowed-sinc fractional resample of ``(..., n_in)`` to ``n_out``."""
    n_in = y.shape[-1]
    rate = n_in / n_out
    pos = jnp.arange(n_out, dtype=jnp.float32) * rate  # source positions
    base = jnp.floor(pos).astype(jnp.int32)
    frac = pos - base
    offs = jnp.asarray(_sinc_kernel(taps))  # (taps,)
    idx = jnp.clip(base[:, None] + offs[None, :].astype(jnp.int32), 0, n_in - 1)
    t = offs[None, :] - frac[:, None]  # (n_out, taps)
    sinc = jnp.sinc(t)
    win = 0.5 + 0.5 * jnp.cos(jnp.pi * jnp.clip(t / (taps // 2), -1.0, 1.0))
    weights = sinc * win
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    gathered = y[..., idx]  # (..., n_out, taps)
    return jnp.sum(gathered * weights, axis=-1)


def _phase_vocoder(
    re: jnp.ndarray, im: jnp.ndarray, rate: float, hop_length: int, n_fft: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """librosa-style phase vocoder on (..., F, T) re/im -> stretched (..., F, T2)."""
    T = re.shape[-1]
    T2 = int(np.ceil(T / rate))
    time_steps = np.arange(T2) * rate  # fractional source frames
    lo = np.minimum(np.floor(time_steps).astype(np.int32), T - 1)
    hi = np.minimum(lo + 1, T - 1)
    alpha = jnp.asarray((time_steps - lo).astype(np.float32))

    F = re.shape[-2]
    omega = jnp.asarray(
        (2.0 * np.pi * hop_length * np.arange(F) / n_fft).astype(np.float32)
    )  # expected phase advance per hop

    mag = jnp.sqrt(re * re + im * im)
    phase = jnp.arctan2(im, re)

    mag_lo, mag_hi = mag[..., lo], mag[..., hi]
    mag_i = (1.0 - alpha) * mag_lo + alpha * mag_hi  # (..., F, T2)

    # instantaneous phase increment between consecutive source frames
    dphase = phase[..., 1:] - phase[..., :-1] - omega[:, None]
    dphase = dphase - 2.0 * np.pi * jnp.round(dphase / (2.0 * np.pi))
    inc_full = jnp.concatenate(
        [jnp.zeros_like(phase[..., :1]), dphase + omega[:, None]], axis=-1
    )  # inc_full[..., t] = true advance from frame t-1 to t
    inc = inc_full[..., hi]  # advance applied at each output step (librosa uses
    # the increment at the interpolation point)
    phase0 = phase[..., :1]
    acc = phase0 + jnp.cumsum(inc, axis=-1) - inc[..., :1]
    return mag_i * jnp.cos(acc), mag_i * jnp.sin(acc)


def time_stretch(
    wav: jnp.ndarray, rate: float, *, n_fft: int = 2048, hop_length: int = 512
) -> jnp.ndarray:
    """Phase-vocoder time stretch: length n -> round(n / rate).

    Complex-free throughout (re/im carried separately) so it compiles on
    TPU runtimes without complex support.
    """
    re, im = stft_realimag(wav, n_fft=n_fft, hop_length=hop_length)
    re2, im2 = _phase_vocoder(re, im, rate, hop_length, n_fft)
    n_out = int(round(wav.shape[-1] / rate))
    return istft(re2, im2, n_fft=n_fft, hop_length=hop_length, length=n_out)


def pitch_shift(
    wav: jnp.ndarray,
    *,
    n_steps: float = 0.005,
    bins_per_octave: int = 12,
    n_fft: int = 2048,
    hop_length: int = 512,
) -> jnp.ndarray:
    """librosa ``pitch_shift`` semantics: stretch by ``2**(-n_steps/B)`` then
    resample back to the original length (same shape out).

    Deterministic (no key) — the randomness in the reference's policy lives
    in *which* augmentation is applied, not inside the transform.
    """
    rate = 2.0 ** (-n_steps / bins_per_octave)
    if abs(rate - 1.0) < 1e-9:
        return wav
    stretched = time_stretch(wav, rate, n_fft=n_fft, hop_length=hop_length)
    return resample_to(stretched, wav.shape[-1])


def spec_augment(
    feat: jnp.ndarray,
    key: jax.Array,
    *,
    n_time_masks: int = 2,
    n_freq_masks: int = 2,
    max_time_width: int = 8,
    max_freq_width: int = 8,
    mask_value: float = 0.0,
) -> jnp.ndarray:
    """SpecAugment time/frequency masking on ``(..., F, T)`` feature maps."""
    Fdim, Tdim = feat.shape[-2], feat.shape[-1]
    batch_shape = feat.shape[:-2]
    flat = feat.reshape((-1,) + feat.shape[-2:])
    B = flat.shape[0]

    def mask_axis(x, k, n_masks, max_width, axis_len, axis):
        coords = jnp.arange(axis_len)
        for i in range(n_masks):
            k, k1, k2 = jax.random.split(k, 3)
            width = jax.random.randint(k1, (B,), 0, max_width + 1)
            start = jax.random.randint(k2, (B,), 0, jnp.maximum(axis_len - width, 1))
            m = (coords[None, :] >= start[:, None]) & (
                coords[None, :] < (start + width)[:, None]
            )
            shape = (B, axis_len, 1) if axis == -2 else (B, 1, axis_len)
            x = jnp.where(m.reshape(shape), mask_value, x)
        return x

    kf, kt = jax.random.split(key)
    flat = mask_axis(flat, kf, n_freq_masks, max_freq_width, Fdim, -2)
    flat = mask_axis(flat, kt, n_time_masks, max_time_width, Tdim, -1)
    return flat.reshape(batch_shape + (Fdim, Tdim))


# --------------------------------------------------------- policy application

AUG_NONE, AUG_PITCH, AUG_NOISE = 0, 1, 2
AUG_CODES = {"": AUG_NONE, None: AUG_NONE, "change pitch": AUG_PITCH, "noise": AUG_NOISE}


def apply_augmentations(
    wav: jnp.ndarray,
    aug_codes: jnp.ndarray,
    key: jax.Array,
    *,
    noise_factor: float = 0.005,
    pitch_steps: float = 0.005,
) -> jnp.ndarray:
    """Apply the reference's per-row augmentation selection on device.

    ``aug_codes`` (B,) int32 — AUG_NONE / AUG_PITCH / AUG_NOISE per row
    (the ``augmentationType`` column, reference/ASV_dl_func.py:111-118).
    Everything computes batched; rows select their variant with ``where``.
    """
    noisy = add_noise(wav, key, factor=noise_factor)
    pitched = pitch_shift(wav, n_steps=pitch_steps)
    code = aug_codes.reshape((-1,) + (1,) * (wav.ndim - 1))
    out = jnp.where(code == AUG_NOISE, noisy, wav)
    return jnp.where(code == AUG_PITCH, pitched, out)


def make_augmented_feature_fn(feature_fn, **aug_kwargs):
    """Wrap a frontend extractor into (wav, aug_codes, key) -> features."""

    @partial(jax.jit)
    def fn(wav, aug_codes, key):
        return feature_fn(apply_augmentations(wav, aug_codes, key, **aug_kwargs))

    return fn
