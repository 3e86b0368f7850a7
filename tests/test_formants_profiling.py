"""Formant analyzer + profiling subsystem tests."""

import numpy as np
import jax.numpy as jnp

from audioanalysisdetector_tpu.frontend.formants import (
    analyze_formants_and_silence,
    burg_lpc,
    formant_tracks,
    intensity_db,
)
from audioanalysisdetector_tpu.utils.profiling import StepTimer, profile_fn, timed


def _ar2_signal(rng, f0=800.0, sr=16000, n=400, r=0.98):
    """Second-order AR process with a resonance at f0 (a one-formant signal)."""
    a1 = -2 * r * np.cos(2 * np.pi * f0 / sr)
    a2 = r * r
    e = rng.standard_normal(n + 200) * 0.01
    y = np.zeros_like(e)
    for t in range(2, len(e)):
        y[t] = e[t] - a1 * y[t - 1] - a2 * y[t - 2]
    return y[200:].astype(np.float32)


def test_burg_recovers_ar_coefficients(rng):
    sr, f0, r = 16000, 800.0, 0.98
    y = _ar2_signal(rng, f0, sr, n=2000, r=r)
    a = np.asarray(burg_lpc(jnp.asarray(y)[None, :], order=2))[0]
    a1_true = -2 * r * np.cos(2 * np.pi * f0 / sr)
    np.testing.assert_allclose(a[0], a1_true, atol=0.02)
    np.testing.assert_allclose(a[1], r * r, atol=0.02)


def test_burg_batched(rng):
    frames = rng.standard_normal((7, 400)).astype(np.float32)
    a = np.asarray(burg_lpc(jnp.asarray(frames), order=10))
    assert a.shape == (7, 10)
    single = np.asarray(burg_lpc(jnp.asarray(frames[3])[None], order=10))[0]
    np.testing.assert_allclose(a[3], single, rtol=1e-4, atol=1e-5)


def _two_formant_signal(rng, f1=700.0, f2=1800.0, sr=16000, n=8000, r=0.96):
    """Cascade of two AR(2) resonators — a crude two-formant vowel."""
    y = _ar2_signal(rng, f1, sr, n, r)
    a1 = -2 * r * np.cos(2 * np.pi * f2 / sr)
    a2 = r * r
    out = np.zeros_like(y)
    for t in range(2, len(y)):
        out[t] = y[t] - a1 * out[t - 1] - a2 * out[t - 2]
    return out.astype(np.float32)


def test_formant_track_finds_resonances(rng):
    # Burg order matched to the pole count (order >> true poles overfits
    # noise with sharp spurious poles — inherent to Burg, and why Praat's
    # order-10 default presumes real speech with ~5 formants)
    y = _two_formant_signal(rng)
    times, formants = formant_tracks(y, 16000, order=6, pre_emphasis=0.0)
    f1 = formants[:, 0]
    f2 = formants[:, 1]
    assert abs(np.nanmedian(f1) - 700.0) < 150.0, np.nanmedian(f1)
    assert abs(np.nanmedian(f2) - 1800.0) < 250.0, np.nanmedian(f2)


def test_intensity_and_silence_ratio(rng):
    sr = 16000
    loud = rng.standard_normal(sr).astype(np.float32) * 0.3
    quiet = np.zeros(sr, np.float32)
    y = np.concatenate([loud, quiet])
    inten = np.asarray(intensity_db(jnp.asarray(y), sr))
    # the loud half sits far above 20 dB SPL; the silent half far below
    assert (inten[: len(inten) // 2 - 4] > 20).all()
    assert (inten[len(inten) // 2 + 4 :] < 20).all()


def test_analyze_formants_and_silence_contract(rng):
    y = _ar2_signal(rng, f0=700.0, n=16000)
    out = analyze_formants_and_silence(y, 16000)
    assert set(out) == {
        "silence_ratio",
        "f1_total_segments", "f2_total_segments",
        "f1_avg_duration", "f2_avg_duration",
        "f1_total_duration", "f2_total_duration",
        "vtl_total_segments", "vtl_avg_duration", "vtl_total_duration",
    }
    assert 0.0 <= out["silence_ratio"] <= 1.0
    assert out["f1_total_segments"] >= 1


def test_step_timer_and_profile_fn():
    timer = StepTimer("unit")
    for t in (0.01, 0.02, 0.03):
        timer.record(t)
    s = timer.summary(items_per_step=100, skip_warmup=1)
    assert s["steps"] == 2
    assert 0 < s["items_per_sec"] < 100 / 0.019

    def f(x):
        return jnp.sum(x * x)

    out = profile_fn(f, jnp.ones(1000), iters=3, items=1000)
    assert out["steps"] == 3 and out["mean_ms"] > 0

    with timed("phase", verbose=False):
        pass


def test_formants_short_audio_fails_cleanly():
    """Sub-window audio raises a named ValueError (the pipeline turns it
    into a None cell per the reference error policy) — previously the
    numpy path crashed with IndexError and the jnp intensity path
    fabricated a frame from clamped gathers."""
    import numpy as np
    import pytest

    from audioanalysisdetector_tpu.frontend.formants import (
        analyze_formants_and_silence,
        intensity_db,
    )

    with pytest.raises(ValueError, match="shorter"):
        analyze_formants_and_silence(np.zeros(300, np.float32), 16000)
    import jax.numpy as jnp

    with pytest.raises(ValueError, match="shorter"):
        intensity_db(jnp.zeros(500), 16000)
