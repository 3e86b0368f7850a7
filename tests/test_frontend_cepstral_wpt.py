"""LFCC / GFCC / WPT tests."""

import numpy as np
import jax.numpy as jnp

from audioanalysisdetector_tpu.frontend.cepstral import (
    CepstralConfig,
    gammatone_filterbank,
    gfcc,
    int16_quirk,
    lfcc,
    linear_filterbank,
    pre_emphasis,
)
from audioanalysisdetector_tpu.frontend.wpt import (
    db4_decomposition_filters,
    wavelet_packet_leaves,
    wpt_energies,
)


def test_int16_quirk_truncates_and_clips():
    y = jnp.asarray([0.5, -0.5, 1.5, -1.5, 1e-5])
    out = np.asarray(int16_quirk(y))
    np.testing.assert_array_equal(out, [16383.0, -16383.0, 32767.0, -32768.0, 0.0])


def test_pre_emphasis():
    y = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    out = np.asarray(pre_emphasis(y, 0.97))
    np.testing.assert_allclose(out, [1.0, 0.03, 0.03, 0.03], atol=1e-6)


def test_lfcc_shape_and_finiteness(rng):
    y = jnp.asarray(rng.standard_normal((2, 32000)).astype(np.float32) * 0.1)
    out = np.asarray(lfcc(y))
    # spafe layout: (batch, n_frames, num_ceps); 199 frames for 2 s @ 16 kHz
    assert out.shape == (2, 199, 13)
    assert np.isfinite(out).all()


def test_gfcc_shape(rng):
    y = jnp.asarray(rng.standard_normal(32000).astype(np.float32) * 0.1)
    out = np.asarray(gfcc(y))
    assert out.shape == (199, 13)
    assert np.isfinite(out).all()


def test_linear_filterbank_tiles_spectrum():
    fb = linear_filterbank(24, 512, 16000.0)
    assert fb.shape == (24, 257)
    # interior bins covered by at least one filter
    assert (fb.sum(axis=0)[11:-11] > 0).all()


def test_gammatone_filterbank_centers_ascend():
    fb = gammatone_filterbank(40, 512, 16000.0)
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()
    assert np.isclose(fb.max(), 1.0)


def test_lfcc_silence_is_constant_floor():
    out = np.asarray(lfcc(jnp.zeros(32000)))
    # all frames identical on silence
    assert np.allclose(out, out[0], atol=1e-4)


def _np_dwt(x, filt):
    """Independent numpy mirror of the pywt-convention level used in wpt.py."""
    L = len(filt)
    out_len = (len(x) + L - 1) // 2
    ext = np.pad(x, L - 1, mode="symmetric")
    conv = np.convolve(ext, filt)
    # full conv index 2k + L - 1 over the odd-subsampled lattice
    start = L  # ext[1:] shift + valid-corr start == full-conv index L
    return conv[start : start + 2 * out_len : 2][:out_len]


def test_wpt_level_matches_numpy(rng):
    x = rng.standard_normal(640).astype(np.float32)
    dec_lo, dec_hi = db4_decomposition_filters()
    leaves = wavelet_packet_leaves(jnp.asarray(x), level=1)
    a_ref = _np_dwt(x.astype(np.float64), dec_lo)
    d_ref = _np_dwt(x.astype(np.float64), dec_hi)
    np.testing.assert_allclose(np.asarray(leaves[0]), a_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(leaves[1]), d_ref, rtol=1e-4, atol=1e-4)


def test_wpt_constant_signal():
    # constant c: level-3 approx ≈ c * 2**1.5, every detail band ≈ 0
    y = jnp.full(4096, 2.0)
    e = np.asarray(wpt_energies(y))
    assert e.shape == (8,)
    np.testing.assert_allclose(e[0], (2.0 * 2**1.5) ** 2, rtol=1e-3)
    assert (e[1:] < 1e-6).all()


def test_wpt_subband_selectivity():
    # a low-frequency tone concentrates energy in the lowest subband (aaa)
    sr = 16000
    t = np.arange(32000) / sr
    y = jnp.asarray(np.sin(2 * np.pi * 300 * t).astype(np.float32))
    e = np.asarray(wpt_energies(y))
    assert e.argmax() == 0
    # a tone near 3 kHz should NOT fall in the lowest band
    y2 = jnp.asarray(np.sin(2 * np.pi * 3000 * t).astype(np.float32))
    e2 = np.asarray(wpt_energies(y2))
    assert e2.argmax() != 0


def test_wpt_batched(rng):
    y = rng.standard_normal((3, 32000)).astype(np.float32)
    e = np.asarray(wpt_energies(jnp.asarray(y)))
    assert e.shape == (3, 8)
    single = np.asarray(wpt_energies(jnp.asarray(y[1])))
    np.testing.assert_allclose(e[1], single, rtol=1e-5, atol=1e-7)


def test_db4_dec_hi_sign_convention():
    """pywt convention: dec_hi[n] = (-1)**(n+1) * rec_lo[n] (Haar: [-.707, .707])."""
    dec_lo, dec_hi = db4_decomposition_filters()
    # orthonormality + QMF structure
    np.testing.assert_allclose(np.sum(dec_lo), np.sqrt(2), atol=1e-10)
    np.testing.assert_allclose(np.sum(dec_hi), 0.0, atol=1e-10)
    np.testing.assert_allclose(np.dot(dec_lo, dec_hi), 0.0, atol=1e-10)
    # sign: first element of dec_hi is NEGATIVE first element of rec_lo
    assert dec_hi[0] < 0
