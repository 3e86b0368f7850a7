"""Formant tracking + silence analysis — the Praat-based prosodic features.

Counterpart of ``analyze_formants_and_silence``
(reference/ASV_dl_func.py:343-401), which uses parselmouth/Praat for
intensity and Burg formant tracking and returns 10 scalar features:
silence ratio, per-formant segment counts/durations, and a vocal-tract
-length proxy ``35000 / (4 * F1)``.

Praat is native C++ with no JAX analogue; this implementation follows the
same published methods (frame intensity in dB SPL re 20 µPa; Burg's-method
LPC per 25 ms frame with pre-emphasis; formants from the LPC polynomial
roots). Burg recursion is batched JAX (static order); polynomial
root-finding runs on host (non-symmetric eigensolve is CPU-only) — this
feature feeds only the classical-ML path, never the hot path (SURVEY.md §7).
Parity with Praat is method-level, not bit-level.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from audioanalysisdetector_tpu.frontend.windows import get_window

_P_REF = 2e-5  # 20 µPa, Praat's dB SPL reference


@partial(jax.jit, static_argnames=("sr", "frame_seconds", "hop_seconds"))
def intensity_db(
    y: jnp.ndarray, sr: int, *, frame_seconds: float = 0.04, hop_seconds: float = 0.01
) -> jnp.ndarray:
    """Frame RMS intensity in dB SPL: (..., n) -> (..., n_frames).

    Jitted (one dispatch per shape — eager jnp is pathological on tunneled
    TPU runtimes). Inputs shorter than one analysis window raise: jnp's
    clamped gather would otherwise fabricate a frame from repeats of the
    last sample and return a silently wrong intensity."""
    frame = int(frame_seconds * sr)
    hop = int(hop_seconds * sr)
    n = y.shape[-1]
    if n < frame:
        raise ValueError(
            f"audio shorter than one {frame_seconds * 1e3:.0f} ms intensity window"
            f" ({n} < {frame} samples)"
        )
    n_frames = 1 + (n - frame) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame)[None, :]
    w = get_window("hann", frame, periodic=True)
    frames = y[..., idx] * jnp.asarray(w, y.dtype)
    rms = jnp.sqrt(jnp.mean(frames * frames, axis=-1) + 1e-20)
    return 20.0 * jnp.log10(rms / _P_REF)


@partial(jax.jit, static_argnames=("order",))
def burg_lpc(frames: jnp.ndarray, order: int = 10) -> jnp.ndarray:
    """Burg's-method LPC coefficients per frame: (..., n) -> (..., order).

    Returns ``a[1..p]`` of ``A(z) = 1 + a1 z^-1 + ... + ap z^-p``.
    Static-order lax loop; batched over leading axes.
    """
    n = frames.shape[-1]
    t = jnp.arange(n)

    def body(m, carry):
        f, b, a = carry
        # textbook Burg stage m over the shrinking lag range, realized with
        # masks so every shape stays static under jit:
        #   fk = f[m+1 : n],  bk = b[m : n-1]  (paired as f[t], b[t-1])
        b_prev = jnp.concatenate([b[..., :1], b[..., :-1]], axis=-1)  # b[t-1]
        mask = (t >= m + 1).astype(f.dtype)
        num = -2.0 * jnp.sum(mask * f * b_prev, axis=-1)
        den = jnp.sum(mask * (f * f + b_prev * b_prev), axis=-1) + 1e-12
        k = (num / den)[..., None]  # reflection coefficient
        # Kay/Marple updates, both stored at index t:
        #   f_{m+1}(t) = f_m(t) + k b_m(t-1);  b_{m+1}(t) = b_m(t-1) + k f_m(t)
        f2 = jnp.where(mask > 0, f + k * b_prev, f)
        b2 = jnp.where(mask > 0, b_prev + k * f, b)
        # Levinson step: a_i += k * a_{m-1-i} for i < m; a_m = k
        i_idx = jnp.arange(order)
        src = jnp.clip(m - 1 - i_idx, 0, order - 1)
        mirrored = jnp.where(i_idx < m, jnp.take(a, src, axis=-1), 0.0)
        a2 = (a + k * mirrored).at[..., m].set(k[..., 0])
        return f2, b2, a2

    a0 = jnp.zeros(frames.shape[:-1] + (order,), frames.dtype)
    _, _, a_fin = jax.lax.fori_loop(0, order, body, (frames, frames, a0))
    return a_fin


def _formants_from_lpc(a_row: np.ndarray, sr: float, *, max_formants: int = 5) -> np.ndarray:
    """LPC coefficients -> formant frequencies (host, numpy roots)."""
    poly = np.concatenate([[1.0], a_row])
    roots = np.roots(poly)
    roots = roots[np.imag(roots) > 0.01]
    freqs = np.angle(roots) * sr / (2 * np.pi)
    bws = -0.5 * sr / np.pi * np.log(np.abs(roots))
    keep = (freqs > 90) & (freqs < sr / 2 - 50) & (bws < 400)
    freqs = np.sort(freqs[keep])
    out = np.full(max_formants, np.nan)
    out[: min(len(freqs), max_formants)] = freqs[:max_formants]
    return out


def formant_tracks(
    y: np.ndarray,
    sr: int,
    *,
    frame_seconds: float = 0.025,
    hop_seconds: float = 0.01,
    order: int = 10,
    pre_emphasis: float = 0.97,
) -> tuple[np.ndarray, np.ndarray]:
    """(times, formants (n_frames, 5)) for one waveform."""
    y = np.asarray(y, np.float32)
    y = np.concatenate([y[:1], y[1:] - pre_emphasis * y[:-1]])
    frame = int(frame_seconds * sr)
    hop = int(hop_seconds * sr)
    if len(y) < frame:
        raise ValueError(
            f"audio shorter than one {frame_seconds * 1e3:.0f} ms analysis frame"
            f" ({len(y)} < {frame} samples)"
        )
    n_frames = 1 + (len(y) - frame) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame)[None, :]
    # no analysis window: Burg models the segment directly and tapering
    # introduces spurious low-bandwidth poles
    frames = y[idx]
    a = np.asarray(burg_lpc(jnp.asarray(frames), order))  # batched on device
    formants = np.stack([_formants_from_lpc(a[i], sr) for i in range(n_frames)])
    times = (np.arange(n_frames) * hop + frame / 2) / sr
    return times, formants


def _segments(mask: np.ndarray) -> list[tuple[int, int]]:
    segs, start = [], None
    for i, val in enumerate(mask):
        if val and start is None:
            start = i
        elif not val and start is not None:
            segs.append((start, i - 1))
            start = None
    if start is not None:
        segs.append((start, len(mask) - 1))
    return segs


def analyze_formants_and_silence(
    y: np.ndarray,
    sr: int,
    *,
    silence_threshold_db: float = 20.0,
    order: int = 10,
) -> dict[str, float]:
    """The reference's 10-feature prosodic dict
    (reference/ASV_dl_func.py:386-397), method-level Praat parity."""
    inten = np.asarray(intensity_db(jnp.asarray(np.asarray(y, np.float32)), sr))
    silence_ratio = float(np.mean(inten < silence_threshold_db))

    times, formants = formant_tracks(np.asarray(y), sr, order=order)
    f1, f2 = formants[:, 0], formants[:, 1]
    vtl = np.where(f1 > 0, 35000.0 / (4.0 * f1), np.nan)

    def seg_stats(values):
        segs = _segments(~np.isnan(values))
        durations = [times[e] - times[s] for s, e in segs if e > s]
        return segs, durations

    f1_segs, f1_dur = seg_stats(f1)
    f2_segs, f2_dur = seg_stats(f2)
    vtl_segs, vtl_dur = seg_stats(vtl)

    def safe_mean(arr):
        return float(np.mean(arr)) if len(arr) else 0.0

    return {
        "silence_ratio": silence_ratio,
        "f1_total_segments": len(f1_segs),
        "f2_total_segments": len(f2_segs),
        "f1_avg_duration": safe_mean(f1_dur),
        "f2_avg_duration": safe_mean(f2_dur),
        "f1_total_duration": float(np.sum(f1_dur)),
        "f2_total_duration": float(np.sum(f2_dur)),
        "vtl_total_segments": len(vtl_segs),
        "vtl_avg_duration": safe_mean(vtl_dur),
        "vtl_total_duration": float(np.sum(vtl_dur)),
    }
