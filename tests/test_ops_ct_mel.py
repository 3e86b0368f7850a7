"""CT-factorized fused mel kernel (ops/ct_mel.py) parity tests.

Runs the Pallas kernel in interpreter mode (CPU) against the production
XLA mel path. The factorization itself is float32-reassociated, so the
interpreter-mode agreement is tight (~1e-5 dB); on real hardware the MXU
accumulation order adds up to ~0.06 dB (documented in the module).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from audioanalysisdetector_tpu.frontend.mel import MelConfig, log_mel_spectrogram
from audioanalysisdetector_tpu.ops.ct_mel import UTT_TILE, ct_log_mel


def test_ct_log_mel_matches_xla_path(rng):
    cfg = MelConfig(sr=16000, n_mels=64)
    wav = jnp.asarray(rng.standard_normal((UTT_TILE, 32000)).astype(np.float32) * 0.1)
    ref = np.asarray(log_mel_spectrogram(wav, cfg))
    out = np.asarray(ct_log_mel(wav, cfg, interpret=True))
    assert out.shape == ref.shape == (UTT_TILE, 64, 63)
    assert np.abs(out - ref).max() < 1e-4


def test_ct_log_mel_matches_under_numeric_ref(rng):
    """A fixed (non-max) dB reference exposes any absolute-power mismatch:
    the conjugate-symmetric fold must split each pair's mel weight, not
    double-count it (a uniform 2x would cancel under ref='max')."""
    cfg = MelConfig(sr=16000, n_mels=64)
    wav = jnp.asarray(rng.standard_normal((UTT_TILE, 32000)).astype(np.float32) * 0.1)
    ref = np.asarray(log_mel_spectrogram(wav, cfg, ref=1.0))
    out = np.asarray(ct_log_mel(wav, cfg, ref=1.0, interpret=True))
    assert np.abs(out - ref).max() < 1e-3


def test_ct_log_mel_silence_finite(rng):
    cfg = MelConfig(sr=16000, n_mels=64)
    out = np.asarray(ct_log_mel(jnp.zeros((UTT_TILE, 32000)), cfg, interpret=True))
    assert np.isfinite(out).all()


def test_ct_mel_rejects_bad_shapes():
    cfg = MelConfig(sr=16000, n_mels=64)
    from audioanalysisdetector_tpu.ops.ct_mel import ct_mel

    with pytest.raises(ValueError, match="multiple"):
        ct_mel(jnp.zeros((UTT_TILE + 1, 34048)), cfg, n_frames=63, interpret=True)


def test_ct_log_mel_pads_partial_batch_tile(rng):
    """ct_log_mel is a drop-in: batches not a multiple of the 8-utt kernel
    tile are zero-padded to the tile and sliced back, bit-equal per row
    (per-utterance dB makes pad rows inert)."""
    cfg = MelConfig(sr=16000, n_mels=64)
    wav = jnp.asarray(rng.standard_normal((UTT_TILE, 32000)).astype(np.float32) * 0.1)
    full = np.asarray(ct_log_mel(wav, cfg, interpret=True))
    for b in (1, 3):
        part = np.asarray(ct_log_mel(wav[:b], cfg, interpret=True))
        assert part.shape == (b,) + full.shape[1:]
        np.testing.assert_array_equal(part, full[:b])


def test_ct_log_mel_zero_right_boundary_frames(rng):
    """Regression (round-4 advisor): hop == n_fft with n % hop >= pad makes
    every frame interior (f_hi == n_frames-1), so the fast path has zero
    right-boundary frames and must skip the right snippet instead of
    handing frame_signal a sub-window signal."""
    cfg = MelConfig(sr=16000, n_mels=64, hop_length=2048)
    assert cfg.hop_length == cfg.n_fft
    wav = jnp.asarray(rng.standard_normal((UTT_TILE, 9728)).astype(np.float32) * 0.1)
    ref = np.asarray(log_mel_spectrogram(wav, cfg))
    out = np.asarray(ct_log_mel(wav, cfg, interpret=True))
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 1e-4


def test_ct_log_mel_in_grid_pad_equals_fallback_pad(rng):
    """The segmented in-grid reflect pad (n % 64 == 0 fast path) and the
    XLA-side full pad (fallback) must produce identical log-mels; a
    non-64-multiple length exercises the fallback against the XLA path."""
    cfg = MelConfig(sr=16000, n_mels=64)
    wav = jnp.asarray(rng.standard_normal((UTT_TILE, 32000)).astype(np.float32) * 0.1)
    fast = np.asarray(ct_log_mel(wav, cfg, interpret=True))  # segmented path
    from audioanalysisdetector_tpu.ops.ct_mel import ct_mel
    from audioanalysisdetector_tpu.frontend.db import power_to_db

    pad = cfg.n_fft // 2
    wav_p = jnp.pad(wav, ((0, 0), (pad, pad)), mode=cfg.pad_mode)
    slow = ct_mel(wav_p, cfg, n_frames=63, interpret=True)
    slow = np.asarray(power_to_db(jnp.swapaxes(slow, -1, -2), ref="max", utt_axes=2))
    assert np.abs(fast - slow).max() < 1e-5

    # fallback path (length not a 64-multiple) still matches XLA
    wav_odd = jnp.asarray(
        rng.standard_normal((UTT_TILE, 32032)).astype(np.float32) * 0.1
    )
    ref = np.asarray(log_mel_spectrogram(wav_odd, cfg))
    out = np.asarray(ct_log_mel(wav_odd, cfg, interpret=True))
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 1e-4
