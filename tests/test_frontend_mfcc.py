"""MFCC / DCT / delta / CMVN parity tests."""

import numpy as np
import jax.numpy as jnp
from scipy.fftpack import dct as scipy_dct
from scipy.signal import savgol_filter

from audioanalysisdetector_tpu.frontend import (
    MFCCConfig,
    add_deltas,
    cmvn,
    dct_ii,
    delta,
    mfcc,
    mfcc_deltas_cmvn,
)
from tests.golden import np_ref


def test_dct_matches_scipy(rng):
    x = rng.standard_normal((17, 9)).astype(np.float32)
    ours = np.asarray(dct_ii(jnp.asarray(x), axis=-2))
    ref = scipy_dct(x.astype(np.float64), type=2, axis=0, norm="ortho")
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_dct_truncation(rng):
    x = rng.standard_normal((84, 5)).astype(np.float32)
    ours = np.asarray(dct_ii(jnp.asarray(x), axis=-2, n_out=19))
    ref = scipy_dct(x.astype(np.float64), type=2, axis=0, norm="ortho")[:19]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_mfcc_matches_golden(rng):
    y = (rng.standard_normal(32000) * 0.1).astype(np.float32)
    out = np.asarray(mfcc(jnp.asarray(y), MFCCConfig.for_sr(16000)))
    ref = np_ref.mfcc_ref(y, 16000)
    assert out.shape == ref.shape == (13, 63)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=5e-3)


def test_mfcc_batched_matches_per_utterance(rng):
    y = (rng.standard_normal((3, 32000)) * 0.1).astype(np.float32)
    batched = np.asarray(mfcc(jnp.asarray(y), MFCCConfig.for_sr(16000)))
    for i in range(3):
        single = np.asarray(mfcc(jnp.asarray(y[i]), MFCCConfig.for_sr(16000)))
        np.testing.assert_allclose(batched[i], single, rtol=1e-5, atol=1e-5)


def test_delta_matches_savgol(rng):
    x = rng.standard_normal((13, 63)).astype(np.float32)
    for order in (1, 2):
        ours = np.asarray(delta(jnp.asarray(x), width=9, order=order, axis=-1))
        ref = savgol_filter(
            x.astype(np.float64), 9, polyorder=order, deriv=order, axis=-1, mode="interp"
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_add_deltas_shape(rng):
    x = jnp.asarray(rng.standard_normal((2, 13, 63)).astype(np.float32))
    out = add_deltas(x)
    assert out.shape == (2, 39, 63)


def test_cmvn_moments(rng):
    x = jnp.asarray(rng.standard_normal((4, 13, 63)).astype(np.float32) * 5 + 3)
    out = np.asarray(cmvn(x, axis=-1))
    np.testing.assert_allclose(out.mean(axis=-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std(axis=-1), 1.0, atol=1e-3)


def test_mfcc_deltas_cmvn_pipeline(rng):
    y = jnp.asarray((rng.standard_normal((2, 32000)) * 0.1).astype(np.float32))
    out = mfcc_deltas_cmvn(y)
    assert out.shape == (2, 39, 63)
    assert np.isfinite(np.asarray(out)).all()
