"""CQT / CQCC behavioral and parity tests."""

import numpy as np
import jax.numpy as jnp
from scipy.fftpack import dct as scipy_dct

from audioanalysisdetector_tpu.frontend.cqt import (
    C1_HZ,
    CQTConfig,
    cqt,
    cqt_frequencies,
    default_n_bins,
)
from audioanalysisdetector_tpu.frontend.cqcc import (
    CQCCConfig,
    cqcc,
    cqcc_from_cqt_mag,
    transpose_cqcc,
)
from tests.golden import np_ref


def tone(f0, sr=16000, n=32000, amp=1.0):
    return (amp * np.sin(2 * np.pi * f0 * np.arange(n) / sr)).astype(np.float32)


def test_default_bins_matches_reference_rule():
    # floor(log2((8000-100)/32.7)) * 12 == 84 (reference/ASV_dl_func.py:455-456)
    assert default_n_bins(16000) == 84
    assert CQTConfig.for_sr(16000).n_bins == 84


def test_cqt_shape_and_finiteness(rng):
    y = jnp.asarray(rng.standard_normal((2, 32000)).astype(np.float32) * 0.1)
    out = np.asarray(cqt(y))
    assert out.shape == (2, 84, 63)
    assert np.isfinite(out).all() and (out >= 0).all()


def test_pure_tones_peak_at_their_bins():
    freqs = cqt_frequencies(84, C1_HZ)
    cfg = CQTConfig()
    for k in (6, 18, 30, 42, 54, 66, 78):  # one bin in every octave
        mag = np.asarray(cqt(jnp.asarray(tone(freqs[k])), cfg))
        # use a center frame to avoid boundary taper
        peak = int(np.argmax(mag[:, 31]))
        assert abs(peak - k) <= 1, (k, peak)


def test_scale_true_sqrt_length_contract():
    """|C_k| ≈ 0.5 * sqrt(N_k) for a unit tone at bin k (librosa scale=True)."""
    cfg = CQTConfig()
    freqs = cqt_frequencies(84, C1_HZ)
    lens = cfg.lengths()
    for k in (20, 44, 68):
        mag = np.asarray(cqt(jnp.asarray(tone(freqs[k])), cfg))
        expected = 0.5 * np.sqrt(lens[k])
        assert abs(mag[k, 31] / expected - 1.0) < 0.1, (k, mag[k, 31], expected)


def test_octave_tones_consistent_across_rates():
    """Bins handled at different decimation levels must obey the same scaling."""
    cfg = CQTConfig()
    freqs = cqt_frequencies(84, C1_HZ)
    lens = cfg.lengths()
    ratios = []
    for k in (10, 34, 58, 80):
        mag = np.asarray(cqt(jnp.asarray(tone(freqs[k])), cfg))
        ratios.append(mag[k, 31] / (0.5 * np.sqrt(lens[k])))
    assert np.ptp(ratios) < 0.15, ratios


def test_cqcc_shape_contract(rng):
    y = jnp.asarray(rng.standard_normal((3, 32000)).astype(np.float32) * 0.1)
    out = np.asarray(cqcc(y))
    assert out.shape == (3, 19, 63)  # the (19, 63) contract
    assert np.isfinite(out).all()
    tt = np.asarray(transpose_cqcc(jnp.asarray(out)))
    assert tt.shape == (3, 63, 19)


def test_cqcc_postprocessing_matches_numpy_golden(rng):
    """Feed a fixed CQT magnitude through both the jax chain and a float64
    numpy implementation of the reference's dB->interp->log->DCT steps."""
    mag = np.abs(rng.standard_normal((84, 63))).astype(np.float32) + 1e-3
    ours = np.asarray(cqcc_from_cqt_mag(jnp.asarray(mag)))

    db = np_ref.amplitude_to_db_ref(mag.astype(np.float64), ref="max")
    src = cqt_frequencies(84, C1_HZ)
    dst = np.linspace(src.min(), src.max(), 84)
    interp = np.empty_like(db)
    for t in range(db.shape[1]):
        interp[:, t] = np.interp(dst, src, db[:, t])
    log_power = np.log(interp**2 + 1e-12)
    ref = scipy_dct(log_power, type=2, axis=0, norm="ortho")[:19]
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=5e-3)


def test_cqcc_batched_matches_single(rng):
    y = rng.standard_normal((2, 32000)).astype(np.float32) * 0.1
    batched = np.asarray(cqcc(jnp.asarray(y)))
    single = np.asarray(cqcc(jnp.asarray(y[1])))
    np.testing.assert_allclose(batched[1], single, rtol=1e-4, atol=1e-4)


def test_cqt_handles_arbitrary_lengths_and_bad_hop():
    # non-divisible lengths are auto-padded; frame count keeps the contract
    out = cqt(jnp.zeros(32001))
    assert out.shape == (84, 1 + 32001 // 512)
    with np.testing.assert_raises(ValueError):
        cqt(jnp.zeros(32000), CQTConfig(hop_length=100))  # hop not divisible


def test_cqcc_at_22050(rng):
    """The reference's librosa default rate: 2 s @ 22050 = 44100 samples
    (not divisible by the decimation chain) must still yield the contract
    frame count."""
    from audioanalysisdetector_tpu.frontend.cqcc import CQCCConfig as _C

    y = jnp.asarray(rng.standard_normal((2, 44100)).astype(np.float32) * 0.1)
    cfg = _C.for_sr(22050)
    out = np.asarray(cqcc(y, cfg))
    assert out.shape == (2, 19, 1 + 44100 // 512)
    assert np.isfinite(out).all()


def test_tone_peak_survives_auto_padding():
    freqs = cqt_frequencies(84, C1_HZ)
    k = 42
    y = tone(freqs[k], n=32000 - 63)  # force padding
    mag = np.asarray(cqt(jnp.asarray(y)))
    assert abs(int(np.argmax(mag[:, 30])) - k) <= 1
