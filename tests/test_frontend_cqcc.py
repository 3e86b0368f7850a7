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


def _multitone(seed=0, sr=16000, n=32000):
    """Multi-tone (on- and off-bin) + noise probe spanning all octaves."""
    rng = np.random.default_rng(seed)
    freqs = cqt_frequencies(84, C1_HZ)
    detune = [1.02, 1.0, 0.97, 1.0, 1.01, 1.0]
    bins = [3, 15, 30, 45, 60, 75]
    y = sum(
        0.3 / (i + 1) * np.sin(2 * np.pi * freqs[k] * d * np.arange(n) / sr + i)
        for i, (k, d) in enumerate(zip(bins, detune))
    )
    return (y + 0.01 * rng.standard_normal(n)).astype(np.float32), bins


def test_cqt_direct_definition_bound():
    """Quantified error of the conv-pyramid CQT vs the float64 definition.

    The golden (np_ref.cqt_ref) is the naive per-bin windowed complex
    correlation at the original rate — no decimation, no FFT. Measured on
    multi-tone + noise (2026-08, CPU f32): driven bins err <= 0.5%, bins
    above 10% of peak median 0.25% / p95 2.5% / max 6.4%, everywhere
    <= 2% of global peak. Bounds below are ~2x the measured values.
    """
    for seed in (0, 1):
        y, bins = _multitone(seed)
        ref = np_ref.cqt_ref(y.astype(np.float64), 16000, 512, C1_HZ, 84)
        got = np.asarray(cqt(jnp.asarray(y), CQTConfig()))
        assert got.shape == ref.shape == (84, 63)
        # the driven (signal-carrying) bins: tight bound, interior frames
        for k in bins:
            rel = np.abs(got[k, 5:-5] - ref[k, 5:-5]) / ref[k, 5:-5]
            assert np.median(rel) < 0.01, (seed, k, np.median(rel))
            assert rel.max() < 0.02, (seed, k, rel.max())
        # all significant bins
        m10 = ref > ref.max() * 0.1
        rel10 = np.abs(got - ref)[m10] / ref[m10]
        assert np.median(rel10) < 0.01, np.median(rel10)
        assert np.percentile(rel10, 95) < 0.05, np.percentile(rel10, 95)
        assert rel10.max() < 0.13, rel10.max()
        m3 = ref > ref.max() * 0.03
        assert (np.abs(got - ref)[m3] / ref[m3]).max() < 0.2
        # and globally: nothing deviates by more than 4% of the peak
        assert (np.abs(got - ref) / ref.max()).max() < 0.04


def test_cqcc_direct_definition_bound():
    """End-to-end flagship CQCC (19, 63) vs the float64 definition chain.

    Measured (2026-08): abs err median 0.016 / p95 0.051 / max 0.145 on
    coefficients spanning ~±73 — i.e. max deviation < 0.2% of the dynamic
    range. Bounds are ~2.5x measured.
    """
    y, _ = _multitone(0)
    ref = np_ref.cqcc_ref(y.astype(np.float64), 16000)
    got = np.asarray(cqcc(jnp.asarray(y), CQCCConfig()))
    assert got.shape == ref.shape == (19, 63)
    err = np.abs(got - ref)
    scale = np.abs(ref).max()
    assert np.median(err) < 0.05, np.median(err)
    assert np.percentile(err, 95) < 0.15, np.percentile(err, 95)
    assert err.max() < 0.4, err.max()
    assert err.max() / scale < 0.006
    # structure, not just magnitude: near-perfect correlation
    c = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert c > 0.9999, c


def test_fast_paths_match_general_paths(rng):
    """The strided-view framing and pad-free decimation (fast paths) must be
    numerically interchangeable with the general padded paths they shortcut."""
    from audioanalysisdetector_tpu.frontend import cqt as cqt_mod

    cases = [
        (16000, 32000),   # flagship: fast framing at octaves 0-2, fast decim
        (16000, 8000),    # short signal
        (22050, 22050),   # auto-padded length, different block divisors
        (8000, 16128),    # odd-ish length (divisible by 2**6 after pad)
    ]
    for sr, n in cases:
        cfg = CQTConfig.for_sr(sr)
        y = jnp.asarray(rng.standard_normal((3, n)).astype(np.float32) * 0.1)
        fast = np.asarray(cqt(y, cfg))
        try:
            cqt_mod._FORCE_GENERAL_FRAMING = True
            cqt_mod._FORCE_PADDED_DECIM = True
            ref = np.asarray(cqt(y, cfg))
        finally:
            cqt_mod._FORCE_GENERAL_FRAMING = False
            cqt_mod._FORCE_PADDED_DECIM = False
        scale = np.abs(ref).max()
        assert np.abs(fast - ref).max() / scale < 1e-4, (sr, n)
