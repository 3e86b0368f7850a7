"""Pallas kernel parity tests (interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from audioanalysisdetector_tpu.frontend.mel import MelConfig, log_mel_spectrogram, melspectrogram
from audioanalysisdetector_tpu.ops.fused_logmel import (
    fused_log_mel_spectrogram,
    fused_mel_from_frames,
)
from audioanalysisdetector_tpu.frontend.stft import frame_signal


def test_fused_mel_matches_reference_path(rng):
    cfg = MelConfig(sr=16000, n_mels=64)
    y = jnp.asarray((rng.standard_normal((2, 32000)) * 0.1).astype(np.float32))
    ref = np.asarray(melspectrogram(y, cfg))  # (2, 64, 63)
    frames = frame_signal(y, n_fft=cfg.n_fft, hop_length=cfg.hop_length)
    flat = frames.reshape(-1, cfg.n_fft)
    fused = np.asarray(fused_mel_from_frames(flat, cfg, interpret=True))
    fused = fused.reshape(2, 63, 64).transpose(0, 2, 1)
    np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-5)


def test_fused_logmel_end_to_end(rng):
    cfg = MelConfig(sr=16000, n_mels=64)
    y = jnp.asarray((rng.standard_normal((3, 32000)) * 0.1).astype(np.float32))
    ref = np.asarray(log_mel_spectrogram(y, cfg))
    fused = np.asarray(fused_log_mel_spectrogram(y, cfg, interpret=True))
    assert fused.shape == ref.shape == (3, 64, 63)
    np.testing.assert_allclose(fused, ref, rtol=1e-3, atol=1e-3)


def test_fused_mel_ragged_tile(rng):
    """N not a multiple of the tile size (zero-padded internally)."""
    cfg = MelConfig(sr=16000, n_mels=64)
    frames = jnp.asarray(rng.standard_normal((100, cfg.n_fft)).astype(np.float32))
    out = np.asarray(fused_mel_from_frames(frames, cfg, interpret=True))
    assert out.shape == (100, 64)
    # row 0 must match an unpadded single-tile call
    single = np.asarray(fused_mel_from_frames(frames[:1], cfg, interpret=True))
    np.testing.assert_allclose(out[:1], single, rtol=1e-5)


def test_fused_mel_bf16_close(rng):
    cfg = MelConfig(sr=16000, n_mels=64)
    frames = jnp.asarray(rng.standard_normal((128, cfg.n_fft)).astype(np.float32))
    f32 = np.asarray(fused_mel_from_frames(frames, cfg, interpret=True))
    bf16 = np.asarray(
        fused_mel_from_frames(frames, cfg, compute_dtype="bfloat16", interpret=True)
    )
    # bf16 inputs, f32 accumulation: relative error bounded by input rounding
    rel = np.abs(bf16 - f32) / np.maximum(np.abs(f32), 1e-3)
    assert np.median(rel) < 0.02


def test_wave_direct_mel_matches_xla_path(rng):
    from audioanalysisdetector_tpu.ops.wave_mel import wave_log_mel

    cfg = MelConfig(sr=16000, n_mels=64)
    y = jnp.asarray((rng.standard_normal((8, 32000)) * 0.1).astype(np.float32))
    ref = np.asarray(log_mel_spectrogram(y, cfg))
    out = np.asarray(wave_log_mel(y, cfg, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
