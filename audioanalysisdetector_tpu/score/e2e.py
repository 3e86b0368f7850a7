"""End-to-end scoring pipelines: waveform batch -> spoof scores, one jit.

BASELINE config #1 / the throughput benchmark unit: decode (host) ->
log-mel (on-device GEMM chain) -> CNN-BiLSTM hybrid -> spoof probability.
The whole on-device portion is a single compiled function; nothing touches
the host between the waveform upload and the (B,) score download.

A CQCC variant feeds the GMM⊕BiLSTM fusion system the same way.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from audioanalysisdetector_tpu.frontend.cqcc import CQCCConfig, cqcc, transpose_cqcc
from audioanalysisdetector_tpu.frontend.mel import MelConfig, log_mel_spectrogram
from audioanalysisdetector_tpu.models.gmm import DiagGMM
from audioanalysisdetector_tpu.score.fused import fused_scores


def melspec_features(wav: jnp.ndarray, mel_cfg: MelConfig) -> jnp.ndarray:
    """(B, n) -> (B, n_mels, T) log-mel feature maps."""
    return log_mel_spectrogram(wav, mel_cfg)


def init_mel_cnn_bilstm(
    mel_cfg: MelConfig,
    n_samples: int,
    *,
    checkpoint: str | None = None,
    seed: int = 0,
):
    """(model, variables) for the flagship mel scorer — the ONE place the
    checkpoint contract lives: ``fit()`` payloads carry the trained params
    AND the trained BatchNorm statistics (inference needs both). Used by
    both ``cli score`` and ``serve`` so they can never drift apart."""

    from audioanalysisdetector_tpu.models.cnn_bilstm import CNNBiLSTMHybrid

    model = CNNBiLSTMHybrid()
    t_frames = 1 + n_samples // mel_cfg.hop_length
    feats0 = jnp.zeros((1, mel_cfg.n_mels, t_frames))
    variables = model.init(jax.random.PRNGKey(seed), feats0, train=False)
    if checkpoint:
        from audioanalysisdetector_tpu.train.checkpoint import load_payload

        payload = load_payload(checkpoint)
        variables = {
            "params": payload["params"],
            "batch_stats": payload.get("batch_stats") or variables["batch_stats"],
        }
    return model, variables


def make_mel_cnn_bilstm_scorer(
    model_apply: Callable,
    variables: dict,
    mel_cfg: MelConfig = MelConfig(sr=16000, n_mels=64),
    *,
    compute_dtype=jnp.float32,
) -> Callable:
    """Jitted ``(B, n_samples) -> (B,)`` spoof scores (sigmoid head)."""

    def score(wav: jnp.ndarray) -> jnp.ndarray:
        feats = melspec_features(wav.astype(compute_dtype), mel_cfg)
        out = model_apply(variables, feats, train=False)
        return out.reshape(out.shape[0])

    return jax.jit(score)


def make_cqcc_fused_scorer(
    bilstm_apply: Callable,
    variables: dict,
    gmm_genuine: DiagGMM,
    gmm_spoof: DiagGMM,
    cqcc_cfg: CQCCConfig = CQCCConfig(),
    *,
    scaler_mean: jnp.ndarray | None = None,
    scaler_std: jnp.ndarray | None = None,
) -> Callable:
    """Jitted ``(B, n_samples) -> (B,)`` fused GMM⊕BiLSTM scores from raw audio.

    Mirrors the reference's full scoring path (CQCC -> transpose -> scale ->
    fuse) without any per-sample host round-trip.
    """
    if (scaler_mean is None) != (scaler_std is None):
        # half a scaler silently skips standardization (or crashes at
        # trace time) and every downstream score is quietly wrong
        raise ValueError("pass BOTH scaler_mean and scaler_std, or neither")

    def score(wav: jnp.ndarray) -> jnp.ndarray:
        feats = transpose_cqcc(cqcc(wav, cqcc_cfg))  # (B, T, 19)
        if scaler_mean is not None:
            feats = (feats - scaler_mean) / scaler_std
        return fused_scores(bilstm_apply, variables, gmm_genuine, gmm_spoof, feats)

    return jax.jit(score)


def make_e2e_train_step_inputs(wav: jnp.ndarray, cqcc_cfg: CQCCConfig) -> jnp.ndarray:
    """Featurize waveforms for the flagship trainer: (B, n) -> (B, 19, T)."""
    return cqcc(wav, cqcc_cfg)
