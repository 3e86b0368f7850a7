"""STFT parity: jax vs float64 numpy golden vs torch.stft (independent impl)."""

import numpy as np
import jax.numpy as jnp
import torch

from audioanalysisdetector_tpu.frontend import stft, power_spectrogram, frame_signal, n_frames_for
from tests.golden import np_ref


def _sig(rng, n=32000):
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


def test_stft_matches_numpy_golden(rng):
    y = _sig(rng)
    ours = np.asarray(stft(jnp.asarray(y), n_fft=2048, hop_length=512))
    ref = np_ref.stft_ref(y, 2048, 512)
    assert ours.shape == ref.shape == (1025, 63)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_stft_matches_torch(rng):
    """torch.stft shares librosa's conventions -> independent cross-check."""
    y = _sig(rng, 16000)
    n_fft, hop = 512, 160
    ours = np.asarray(stft(jnp.asarray(y), n_fft=n_fft, hop_length=hop))
    w = torch.hann_window(n_fft, periodic=True, dtype=torch.float64)
    theirs = torch.stft(
        torch.tensor(y, dtype=torch.float64), n_fft=n_fft, hop_length=hop,
        window=w, center=True, pad_mode="reflect", return_complex=True,
    ).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-3)


def test_matmul_path_matches_fft_path(rng):
    y = jnp.asarray(_sig(rng, 8000))
    a = stft(y, n_fft=1024, hop_length=256, method="fft")
    b = stft(y, n_fft=1024, hop_length=256, method="matmul")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-2)


def test_power_spectrogram_batched(rng):
    y = np.stack([_sig(rng, 8000), _sig(rng, 8000)])
    P = np.asarray(power_spectrogram(jnp.asarray(y), n_fft=1024, hop_length=256))
    assert P.shape == (2, 513, 1 + 8000 // 256)
    ref0 = np.abs(np_ref.stft_ref(y[0], 1024, 256)) ** 2
    np.testing.assert_allclose(P[0], ref0, rtol=1e-3, atol=1e-2)


def test_frame_counts():
    assert n_frames_for(32000, 512, 2048, center=True) == 63
    f = frame_signal(jnp.zeros((3, 32000)), n_fft=2048, hop_length=512)
    assert f.shape == (3, 63, 2048)


def test_win_length_shorter_than_nfft(rng):
    y = _sig(rng, 8000)
    ours = np.asarray(stft(jnp.asarray(y), n_fft=1024, hop_length=256, win_length=400))
    ref = np_ref.stft_ref(y, 1024, 256, win_length=400)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_block_power_spectrogram_matches_direct(rng):
    """The shared-block DFT decomposition (measured-and-rejected perf
    alternative; see its docstring) must still be algebraically right:
    it matches the direct windowed-DFT path within the f32 leakage-
    cancellation bound measured when it was written (<=0.5% of peak)."""
    from audioanalysisdetector_tpu.frontend.stft import power_spectrogram

    y = jnp.asarray(
        (rng.standard_normal((3, 16000)) * 0.3
         + np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)).astype(np.float32)
    )
    a = np.asarray(power_spectrogram(y, method="matmul"))
    b = np.asarray(power_spectrogram(y, method="block"))
    assert a.shape == b.shape
    assert np.abs(a - b).max() / a.max() < 0.005
    # and in float64-golden terms the big bins agree tightly
    m = a > a.max() * 1e-2
    assert (np.abs(a - b)[m] / a[m]).max() < 0.02


def test_block_method_eligibility():
    from audioanalysisdetector_tpu.frontend.stft import block_method_eligible

    assert block_method_eligible(2048, 512, None, "hann", True)
    assert not block_method_eligible(2048, 500, None, "hann", True)   # hop !| n_fft
    assert not block_method_eligible(2048, 512, 1024, "hann", True)   # short window
    assert not block_method_eligible(2048, 512, None, "hamming", True)
    assert not block_method_eligible(2048, 512, None, "hann", False)  # no centering


def test_n_frames_for_matches_frame_signal_odd_nfft():
    """Odd n_fft center-pads by n_fft-1, so the 1 + n//hop shortcut is one
    off — n_frames_for must agree with frame_signal exactly."""
    import jax.numpy as jnp

    from audioanalysisdetector_tpu.frontend.stft import frame_signal, n_frames_for

    for n, hop, nfft, center in [
        (1000, 100, 255, True), (1000, 100, 256, True),
        (32000, 512, 2048, True), (4096, 256, 1023, False),
    ]:
        frames = frame_signal(jnp.zeros(n), n_fft=nfft, hop_length=hop, center=center)
        assert frames.shape[-2] == n_frames_for(n, hop, nfft, center), (n, hop, nfft, center)


def test_stft_rejects_bad_method_and_short_signal():
    import jax.numpy as jnp
    import pytest

    from audioanalysisdetector_tpu.frontend.stft import (
        frame_signal,
        n_frames_for,
        power_spectrogram,
    )

    with pytest.raises(ValueError, match="unknown stft method"):
        power_spectrogram(jnp.zeros(4096), n_fft=512, method="matmuul")
    with pytest.raises(ValueError, match="shorter than one"):
        frame_signal(jnp.zeros(100), n_fft=512, hop_length=128, center=False)
    with pytest.raises(ValueError, match="shorter than one"):
        n_frames_for(100, 128, 512, False)
