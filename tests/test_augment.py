"""On-device augmentation tests: iSTFT round trip, pitch shift, masks."""

import numpy as np
import jax
import jax.numpy as jnp

from audioanalysisdetector_tpu.data.augment import (
    AUG_NOISE,
    AUG_NONE,
    AUG_PITCH,
    add_noise,
    apply_augmentations,
    pitch_shift,
    resample_to,
    spec_augment,
    time_shift,
    time_stretch,
)
from audioanalysisdetector_tpu.frontend.istft import istft
from audioanalysisdetector_tpu.frontend.stft import stft


def _tone(f0, sr=16000, n=32000, amp=0.5):
    return (amp * np.sin(2 * np.pi * f0 * np.arange(n) / sr)).astype(np.float32)


def _dominant_freq(y, sr=16000):
    y = np.asarray(y, dtype=np.float64)
    # ignore edges where OLA tapers
    y = y[2048:-2048] * np.hanning(len(y) - 4096)
    spec = np.abs(np.fft.rfft(y))
    return np.fft.rfftfreq(len(y), 1 / sr)[np.argmax(spec)]


def test_istft_round_trip(rng):
    y = (rng.standard_normal(16384) * 0.2).astype(np.float32)
    spec = stft(jnp.asarray(y), n_fft=2048, hop_length=512, method="matmul")
    rec = np.asarray(
        istft(jnp.real(spec), jnp.imag(spec), n_fft=2048, hop_length=512, length=len(y))
    )
    # interior matches (edges lose energy to the analysis taper)
    np.testing.assert_allclose(rec[2048:-2048], y[2048:-2048], atol=5e-3)


def test_add_noise_level(rng):
    wav = jnp.zeros((3, 8000))
    out = np.asarray(add_noise(wav, jax.random.PRNGKey(0), factor=0.01))
    assert abs(out.std() - 0.01) < 2e-3


def test_time_shift_preserves_content(rng):
    wav = jnp.asarray(rng.standard_normal((4, 1000)).astype(np.float32))
    out = np.asarray(time_shift(wav, jax.random.PRNGKey(1), max_frac=0.2))
    for i in range(4):
        np.testing.assert_allclose(np.sort(out[i]), np.sort(np.asarray(wav[i])), atol=1e-6)


def test_resample_identity_and_ratio():
    y = jnp.asarray(_tone(440, n=16000))
    same = np.asarray(resample_to(y, 16000))
    np.testing.assert_allclose(same[100:-100], np.asarray(y)[100:-100], atol=1e-3)
    half = resample_to(y, 8000)  # 2x faster playback -> 880 Hz at same sr
    assert abs(_dominant_freq(np.asarray(half), sr=16000) - 880) < 15


def test_time_stretch_keeps_pitch():
    y = jnp.asarray(_tone(440))
    out = time_stretch(y, rate=0.8)  # longer signal, same pitch
    assert out.shape[-1] == 40000
    assert abs(_dominant_freq(np.asarray(out)) - 440) < 10


def test_pitch_shift_moves_frequency():
    y = jnp.asarray(_tone(440))
    up = pitch_shift(y, n_steps=4.0)  # +4 semitones: 440 -> ~554.4 Hz
    assert up.shape == y.shape
    f = _dominant_freq(np.asarray(up))
    assert abs(f - 554.4) < 15, f
    # reference default (1/200 semitone) is a near-identity, as documented
    tiny = pitch_shift(y, n_steps=0.005)
    assert abs(_dominant_freq(np.asarray(tiny)) - 440) < 5


def test_spec_augment_masks(rng):
    feat = jnp.ones((3, 19, 63))
    out = np.asarray(
        spec_augment(feat, jax.random.PRNGKey(0), max_time_width=10, max_freq_width=5)
    )
    assert out.shape == (3, 19, 63)
    assert (out == 0).any()  # something was masked
    assert (out == 1).sum() > out.size * 0.4  # but not everything


def test_apply_augmentations_per_row_selection(rng):
    wav = jnp.asarray(rng.standard_normal((3, 32000)).astype(np.float32) * 0.1)
    codes = jnp.asarray([AUG_NONE, AUG_PITCH, AUG_NOISE])
    out = np.asarray(
        apply_augmentations(wav, codes, jax.random.PRNGKey(0), noise_factor=0.05)
    )
    np.testing.assert_array_equal(out[0], np.asarray(wav[0]))  # untouched
    assert not np.allclose(out[1], np.asarray(wav[1]))  # pitched
    resid = out[2] - np.asarray(wav[2])
    assert abs(resid.std() - 0.05) < 0.01  # noise at the requested level
