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
    with pytest.raises(ValueError, match="multiple"):
        ct_log_mel(jnp.zeros((UTT_TILE + 1, 32000)), cfg, interpret=True)
