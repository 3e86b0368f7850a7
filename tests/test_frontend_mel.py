"""Mel filterbank / log-mel / dB parity tests."""

import numpy as np
import jax.numpy as jnp

from audioanalysisdetector_tpu.frontend import (
    MelConfig,
    amplitude_to_db,
    log_mel_spectrogram,
    mel_filterbank,
    melspectrogram,
    power_to_db,
)
from tests.golden import np_ref


def test_mel_filterbank_matches_golden():
    ours = mel_filterbank(16000.0, 2048, 64, 0.0, 8000.0, False, "slaney")
    ref = np_ref.mel_fb_ref(16000, 2048, 64)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)


def test_mel_filterbank_slaney_breakpoint():
    # Slaney scale: linear below 1 kHz, log above; filters must tile [0, 8000]
    fb = mel_filterbank(16000.0, 2048, 64, 0.0, 8000.0, False, None)
    # un-normalized triangles peak near 1.0 (FFT grid quantizes the apex)
    assert 0.99 < fb.max() <= 1.0 + 1e-9
    # every FFT bin strictly inside (first_center, last_center) is covered
    coverage = fb.sum(axis=0)
    assert (coverage[20:-180] > 0).all()


def test_pure_tone_lands_in_correct_mel_band(rng):
    sr, f0 = 16000, 440.0
    t = np.arange(32000) / sr
    y = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    cfg = MelConfig(sr=sr, n_mels=64)
    M = np.asarray(melspectrogram(jnp.asarray(y), cfg))
    band_energy = M.mean(axis=1)
    centers = np_ref.mel_to_hz_ref(
        np.linspace(np_ref.hz_to_mel_ref(0.0), np_ref.hz_to_mel_ref(8000.0), 66)
    )[1:-1]
    peak_band = int(np.argmax(band_energy))
    assert abs(centers[peak_band] - f0) < 100.0  # within one band's width


def test_melspectrogram_matches_golden(rng):
    y = (rng.standard_normal(32000) * 0.1).astype(np.float32)
    cfg = MelConfig(sr=16000, n_mels=64)
    ours = np.asarray(melspectrogram(jnp.asarray(y), cfg))
    ref = np_ref.melspectrogram_ref(y, 16000, n_mels=64)
    assert ours.shape == ref.shape == (64, 63)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_power_to_db_ref_max_per_utterance(rng):
    # batch of two utterances with very different scales: the dB reference
    # must be per-utterance (reference/ASV_dl_func.py:534 ref=np.max).
    a = rng.random((5, 7)) + 0.5
    b = (rng.random((5, 7)) + 0.5) * 1e6
    batch = jnp.asarray(np.stack([a, b]), dtype=jnp.float32)
    out = np.asarray(power_to_db(batch, ref="max"))
    np.testing.assert_allclose(out[0], np_ref.power_to_db_ref(a, ref="max"), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(out[1], np_ref.power_to_db_ref(b, ref="max"), rtol=1e-4, atol=1e-3)
    assert out.max() <= 1e-5  # both peak at 0 dB


def test_top_db_clipping(rng):
    S = np.concatenate([np.ones(3), np.full(3, 1e-30)])[None, :]
    out = np.asarray(power_to_db(jnp.asarray(S, dtype=jnp.float32), ref="max", top_db=80.0))
    assert np.isclose(out.min(), -80.0)


def test_amplitude_to_db_matches_golden(rng):
    S = np.abs(rng.standard_normal((33, 21))).astype(np.float32) + 1e-3
    ours = np.asarray(amplitude_to_db(jnp.asarray(S), ref="max"))
    ref = np_ref.amplitude_to_db_ref(S.astype(np.float64), ref="max")
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_log_mel_end_to_end_contract(rng):
    """extract_mel_spectrogram contract: n_mels=64, fmax=sr/2, dB ref=max
    (reference/ASV_dl_func.py:522-538), batched over utterances."""
    y = (rng.standard_normal((4, 32000)) * 0.2).astype(np.float32)
    out = np.asarray(log_mel_spectrogram(jnp.asarray(y), MelConfig(sr=16000, n_mels=64)))
    assert out.shape == (4, 64, 63)
    for i in range(4):
        ref = np_ref.power_to_db_ref(
            np_ref.melspectrogram_ref(y[i], 16000, n_mels=64), ref="max"
        )
        np.testing.assert_allclose(out[i], ref, rtol=1e-3, atol=1e-2)


def test_mel_parity_at_22050(rng):
    """librosa's default sample rate — parity must hold across rates."""
    y = (rng.standard_normal(44100) * 0.1).astype(np.float32)
    cfg = MelConfig(sr=22050, n_mels=64)
    ours = np.asarray(melspectrogram(jnp.asarray(y), cfg))
    ref = np_ref.melspectrogram_ref(y, 22050, n_mels=64)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_mel_profile_resolver():
    """MelConfig.for_profile is the single train/score/serve profile map."""
    import pytest

    assert MelConfig.for_profile("parity", 16000) == MelConfig(sr=16000, n_mels=64)
    sp = MelConfig.for_profile("speech", 16000, n_mels=64)
    assert sp == MelConfig.for_speech(16000, n_mels=64)
    assert (sp.n_fft, sp.hop_length) == (512, 256)  # 32 ms / 16 ms at 16 kHz
    with pytest.raises(ValueError, match="unknown mel profile"):
        MelConfig.for_profile("music", 16000)
