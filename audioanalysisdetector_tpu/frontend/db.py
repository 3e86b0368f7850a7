"""Decibel conversions with librosa-parity semantics.

The reference converts spectrograms to dB with ``ref=np.max``
(reference/ASV_dl_func.py:460, 534) — a *per-utterance* reference, which
matters for batched TPU execution: the max is taken over each utterance's
spectrogram independently, never over the whole batch. ``top_db=80``
clipping (librosa's default) is likewise per utterance.
"""

from __future__ import annotations

import jax.numpy as jnp


def power_to_db(
    S: jnp.ndarray,
    *,
    ref: float | str = 1.0,
    amin: float = 1e-10,
    top_db: float | None = 80.0,
    utt_axes: int = 2,
) -> jnp.ndarray:
    """``10*log10(S/ref)`` with optional per-utterance max reference.

    Args:
      S: power spectrogram ``(..., n_freq, n_frames)`` (non-negative).
      ref: scalar reference, or ``"max"`` for per-utterance maximum
        (librosa ``ref=np.max`` applied per utterance).
      amin: floor for both ``S`` and ``ref``.
      top_db: clip to ``max - top_db`` per utterance (None disables).
      utt_axes: how many trailing axes form one utterance's spectrogram
        (reductions for max/ref span exactly these axes).
    """
    axes = tuple(range(-utt_axes, 0))
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, S))
    if ref == "max":
        ref_val = jnp.max(S, axis=axes, keepdims=True)
    else:
        ref_val = jnp.asarray(ref, dtype=S.dtype)
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(amin, ref_val))
    if top_db is not None:
        if top_db < 0:
            raise ValueError("top_db must be non-negative")
        peak = jnp.max(log_spec, axis=axes, keepdims=True)
        log_spec = jnp.maximum(log_spec, peak - top_db)
    return log_spec


def amplitude_to_db(
    S: jnp.ndarray,
    *,
    ref: float | str = 1.0,
    amin: float = 1e-5,
    top_db: float | None = 80.0,
    utt_axes: int = 2,
) -> jnp.ndarray:
    """``20*log10(S/ref)`` — librosa semantics: power_to_db of the squares."""
    ref_sq = "max" if ref == "max" else float(ref) ** 2
    return power_to_db(
        S * S, ref=ref_sq, amin=amin * amin, top_db=top_db, utt_axes=utt_axes
    )
