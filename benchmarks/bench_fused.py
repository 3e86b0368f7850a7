#!/usr/bin/env python
"""Flagship fused-scorer benchmark: waveforms -> CQCC -> GMM⊕BiLSTM scores.

The reference's public scoring path (``eval_model``/``fused_score``,
reference/ASV_dl_func.py:1448-1515) evaluated 2066 utterances in 10.27 s
(~201 utt/s) with a per-sample host↔device round trip. Here the whole chain
— multi-octave CQT -> CQCC (19,63) -> transpose -> frame scaling -> stacked
BiLSTM softmax ⊕ GMM masked-LLR sigmoid, 0.5/0.5 blend — is ONE compiled
dispatch per batch, chained through an accumulator so dispatch-only timing
is impossible (block_until_ready is unreliable on tunneled runtimes).

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

    from audioanalysisdetector_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from audioanalysisdetector_tpu.frontend.cqcc import CQCCConfig, cqcc, transpose_cqcc
    from audioanalysisdetector_tpu.models.bilstm_classifier import BiLSTMClassifier
    from audioanalysisdetector_tpu.models.gmm import DiagGMM
    from audioanalysisdetector_tpu.score.fused import fused_scores

    sr, seconds, batch, n_iters = 16000, 2, 4096, 50
    cfg = CQCCConfig.for_sr(sr)
    rng = np.random.default_rng(0)

    model = BiLSTMClassifier()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 63, 19)), train=False)
    k, d = 128, 19
    gmm_g = DiagGMM(
        weights=jnp.full((k,), 1 / k),
        means=jnp.asarray(rng.standard_normal((k, d)), jnp.float32),
        variances=jnp.ones((k, d)) * 1.5,
    )
    gmm_s = DiagGMM(
        weights=jnp.full((k,), 1 / k),
        means=jnp.asarray(rng.standard_normal((k, d)), jnp.float32),
        variances=jnp.ones((k, d)) * 0.8,
    )

    # acc (an input) serializes the dispatch chain; it feeds only the
    # output-side reduction, so the waveform isn't copied per iteration
    def chained(wav, acc):
        feats = transpose_cqcc(cqcc(wav, cfg))
        s = fused_scores(model.apply, variables, gmm_g, gmm_s, feats)
        return acc + jnp.sum(s)

    step = jax.jit(chained)

    # inputs generated ON DEVICE (the tunnel's ~20-40 MB/s H2D would
    # otherwise dominate; bench_e2e.py measures the upload-inclusive path)
    # one jitted dispatch — eager normal+multiply on a 512 MB array would
    # run op-by-op through the tunnel (CLAUDE.md)
    wav = jax.jit(
        lambda k: jax.random.normal(k, (batch, sr * seconds)) * 0.1
    )(jax.random.PRNGKey(1))
    acc = step(wav, jnp.zeros((), jnp.float32))  # compile
    assert np.isfinite(float(acc))

    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(n_iters):
        acc = step(wav, acc)
    float(acc)
    dt = time.perf_counter() - t0

    utt_s = batch * n_iters / dt
    print(json.dumps({
        "metric": "fused_cqcc_gmm_bilstm_score_throughput",
        "value": round(utt_s, 1),
        "unit": "utt/s",
        "vs_baseline": round(utt_s / BASELINE_UTT_PER_SEC, 2),
        "batch": batch,
    }))


if __name__ == "__main__":
    main()
