#!/usr/bin/env python
"""Training-step benchmark: wav -> log-mel -> CNN-BiLSTM fwd+bwd+Adam, one jit.

The reference never reports a training-throughput number (its BiLSTM run was
interrupted after 2 epochs, ASV_deep_learning.ipynb cell 24); the comparison
anchor here is the same 201 utt/s fused *inference* rate — training faster
than the reference scores is the point worth a number.

One iteration = on-device featurization + forward + backward + Adam update +
metrics, a single compiled dispatch. Iterations chain through the evolving
TrainState (step N+1 consumes N's params), and the final loss fetch forces
the chain — dispatch-only timing is impossible by construction.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BASELINE_UTT_PER_SEC = 201.17


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from audioanalysisdetector_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from audioanalysisdetector_tpu.frontend.mel import MelConfig
    from audioanalysisdetector_tpu.models.cnn_bilstm import CNNBiLSTMHybrid
    from audioanalysisdetector_tpu.score.e2e import melspec_features
    from audioanalysisdetector_tpu.train.losses import get_loss
    from audioanalysisdetector_tpu.train.state import TrainState
    from audioanalysisdetector_tpu.train.steps import make_train_step

    # measured: 138.9k utt/s @2048, 144.0k @4096, 148.9k @8192 — take 8192
    sr, seconds, batch, n_iters = 16000, 2, 8192, 40
    mel_cfg = MelConfig(sr=sr, n_mels=64)

    model = CNNBiLSTMHybrid(logits=True)
    feats0 = jnp.zeros((1, mel_cfg.n_mels, 1 + sr * seconds // mel_cfg.hop_length))
    variables = model.init(jax.random.PRNGKey(0), feats0, train=False)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=optax.adam(1e-4),
    )
    step = make_train_step(get_loss("BCELoss"), has_batch_stats=True, binary_head=True)

    def train_iter(state, wav, y, rng):
        feats = melspec_features(wav, mel_cfg)
        return step(state, feats, y, rng)

    fused = jax.jit(train_iter)

    # inputs generated ON DEVICE (tunnel H2D would otherwise dominate;
    # bench_e2e.py measures the upload-inclusive path)
    wav = jax.random.normal(jax.random.PRNGKey(1), (batch, sr * seconds)) * 0.1
    y = (jax.random.uniform(jax.random.PRNGKey(2), (batch,)) < 0.5).astype(jnp.int32)
    rng = jax.random.PRNGKey(3)

    state, m = fused(state, wav, y, rng)  # compile
    assert np.isfinite(float(m["loss"]))

    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, m = fused(state, wav, y, rng)
    assert np.isfinite(float(m["loss"]))  # forces the whole chain
    dt = time.perf_counter() - t0

    utt_s = batch * n_iters / dt

    # second lane: the 16 kHz speech front-end profile (512-point window /
    # hop 256 — MelConfig.for_speech), the same profile the scoring bench
    # reports. Training is mel-dominated exactly like scoring, so the
    # deployment profile should speed it up comparably.
    sp_cfg = MelConfig.for_speech(sr=sr, n_mels=64)
    sp_model = CNNBiLSTMHybrid(logits=True)
    sp_feats0 = jnp.zeros((1, sp_cfg.n_mels, 1 + sr * seconds // sp_cfg.hop_length))
    sp_vars = sp_model.init(jax.random.PRNGKey(0), sp_feats0, train=False)
    sp_state = TrainState.create(
        apply_fn=sp_model.apply,
        params=sp_vars["params"],
        batch_stats=sp_vars["batch_stats"],
        tx=optax.adam(1e-4),
    )

    def sp_train_iter(state, wav, y, rng):
        feats = melspec_features(wav, sp_cfg)
        return step(state, feats, y, rng)

    sp_fused = jax.jit(sp_train_iter)
    sp_state, m = sp_fused(sp_state, wav, y, rng)  # compile
    assert np.isfinite(float(m["loss"]))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        sp_state, m = sp_fused(sp_state, wav, y, rng)
    assert np.isfinite(float(m["loss"]))
    sp_utt_s = batch * n_iters / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "train_step_mel_cnn_bilstm_throughput",
        "value": round(utt_s, 1),
        "unit": "utt/s",
        "vs_baseline": round(utt_s / BASELINE_UTT_PER_SEC, 2),
        "batch": batch,
        "ms_per_step": round(dt / n_iters * 1000, 2),
        "speech_profile_utt_s": round(sp_utt_s, 1),
    }))


if __name__ == "__main__":
    main()
