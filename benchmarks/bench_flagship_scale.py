#!/usr/bin/env python
"""Reference-scale flagship run: the WHOLE GMM⊕BiLSTM system at the
reference's own corpus size, wall-clock per stage on one chip.

The reference's only published end-to-end numbers come from a single
executed run of ASV_deep_learning.ipynb cells 22-25 at this scale
(train 14158/14158 2-s chunks, test 1033/1033):

  UBM EM, 128 comps / 100 iters / ~1.78M frames : 478.85 s  (CPU sklearn)
  MAP adaptation, 2 classes                     :  87.11 s
  fused GMM⊕BiLSTM eval, 2066 utterances        :  10.27 s  (~201 utt/s)
  BiLSTM training                               : interrupted at 2 epochs
                                                  (no total published)

This bench runs the same pipeline shape at the same scale through the
repo's PRODUCT code paths — ``frontend.cqcc``, ``data.scaler.FrameScaler``
semantics, ``train.loop.bilstm_pipeline`` (run-dir artifacts included),
``models.gmm.fit_em``/``map_adapt`` with ``train/gmm_system`` settings,
``score.fused.eval_fused`` — and prints per-stage wall seconds plus the
speedup over the 576.23 s the reference spent in its three timed stages.

Data: device-generated class-separable waveforms (bonafide = low-passed
noise, spoof = white noise). Labels only matter for the sanity metrics
readout; every stage's FLOPs and wall-clock are label-independent, and
on-device generation keeps this harness's ~20-40 MB/s H2D tunnel (a
harness artifact; see bench_decode_scaling.py for the measured
decode/upload terms) out of the timings, like every other bench here.
BiLSTM batch size is 1024 (the reference used 16 on a GPU; batch size is
a free parameter of the recipe at fixed epochs — 16 would make THIS
harness's ~15-20 ms per-dispatch tunnel RPC the dominant term).

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SR, SECONDS = 16000, 2
N_TRAIN_PER_CLASS = 14158  # ASV_deep_learning.ipynb cell 24 output
N_EVAL_PER_CLASS = 1033  # cell 25 output
GEN_BATCH = 4096
EPOCHS = 50  # reference BiLSTM_model default (cells 22-24 recipe)
REF_UBM_S = 478.85
REF_MAP_S = 87.11
REF_EVAL_S = 10.27


def main() -> None:
    import jax
    import jax.numpy as jnp

    from audioanalysisdetector_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from audioanalysisdetector_tpu.data.scaler import FrameScaler
    from audioanalysisdetector_tpu.frontend.cqcc import CQCCConfig, cqcc, transpose_cqcc
    from audioanalysisdetector_tpu.models.gmm import fit_em, map_adapt
    from audioanalysisdetector_tpu.score.fused import eval_fused, make_fused_scorer
    from audioanalysisdetector_tpu.train.gmm_system import load_bilstm_model
    from audioanalysisdetector_tpu.train.loop import bilstm_pipeline

    cfg = CQCCConfig.for_sr(SR)
    n_wav = SR * SECONDS

    # ---- stage 1: feature extraction (device-generated wav -> CQCC) ----
    # one fused dispatch per batch: synth + CQCC + transpose; only the
    # (B, 63, 19) features survive (28k uncompressed waveforms would be
    # ~3.7 GB of HBM for no reason)
    kern = jnp.asarray(np.hanning(9) / np.hanning(9).sum(), jnp.float32)

    @jax.jit
    def synth_extract(key, bonafide_mask):
        wav = jax.random.normal(key, (GEN_BATCH, n_wav), jnp.float32) * 0.1
        low = jax.vmap(lambda r: jnp.convolve(r, kern, mode="same"))(wav)
        wav = jnp.where(bonafide_mask[:, None], low, wav)
        return transpose_cqcc(cqcc(wav, cfg))  # (B, 63, 19)

    def build_split(n_per_class, seed):
        n = 2 * n_per_class
        y = np.zeros(n, np.int64)
        y[n_per_class:] = 1  # 0 = bonafide/genuine, 1 = spoof (reference map)
        feats = []
        for i in range(0, n, GEN_BATCH):
            # mask built + padded HOST-side: eager jnp asarray/concatenate
            # here are ~15-20 ms tunnel RPCs per batch inside t_extract
            mask_np = np.zeros(GEN_BATCH, bool)
            chunk = y[i : i + GEN_BATCH] == 0
            mask_np[: len(chunk)] = chunk
            feats.append(synth_extract(jax.random.PRNGKey(seed + i), mask_np))
        return jnp.concatenate(feats)[:n], y

    # warm-up: compile (or cache-load) the extraction program OUTSIDE the
    # timed stage — a cold compile on this tunneled runtime costs 80-150 s
    # (one-time; persistent cache) and would otherwise swamp the ~0.6 s of
    # actual extraction work
    t0 = time.perf_counter()
    float(jnp.sum(synth_extract(jax.random.PRNGKey(9), jnp.zeros(GEN_BATCH, bool))))
    t_compile_extract = time.perf_counter() - t0

    t0 = time.perf_counter()
    x_train, y_train = build_split(N_TRAIN_PER_CLASS, seed=0)
    x_eval, y_eval = build_split(N_EVAL_PER_CLASS, seed=1_000_000)
    float(jnp.sum(x_eval[-1]))  # force (block_until_ready is a no-op here)
    t_extract = time.perf_counter() - t0

    # ---- stage 2: frame scaler (reference prepare_train_test_data) ----
    t0 = time.perf_counter()
    mean, std = jax.jit(
        lambda x: (
            jnp.mean(x.reshape(-1, x.shape[-1]), axis=0),
            jnp.std(x.reshape(-1, x.shape[-1]), axis=0),
        )
    )(x_train)
    scaler = FrameScaler(
        mean=np.asarray(mean), std=np.where(np.asarray(std) == 0.0, 1.0, np.asarray(std))
    )
    scale = jax.jit(scaler.transform)
    x_train, x_eval = scale(x_train), scale(x_eval)
    float(jnp.sum(x_eval[-1]))
    t_scale = time.perf_counter() - t0

    with tempfile.TemporaryDirectory(prefix="flagship_scale_") as model_dir:
        # warm-up: 1-epoch fit on the full shapes populates the persistent
        # compile cache for the train/eval steps (fit() builds fresh jit
        # closures per call, so the timed run pays a disk cache-load, not a
        # cold compile)
        t0 = time.perf_counter()
        with tempfile.TemporaryDirectory(prefix="flagship_warm_") as warm_dir:
            bilstm_pipeline(
                (x_train, y_train), (x_eval, y_eval),
                num_epochs=1, batch_size=1024, hidden=128,
                model_dir=warm_dir, verbose=False,
            )
        t_compile_bilstm = time.perf_counter() - t0

        # ---- stage 3: BiLSTM training, full artifact contract ----
        t0 = time.perf_counter()
        result, bilstm_metrics = bilstm_pipeline(
            (x_train, y_train), (x_eval, y_eval),
            num_epochs=EPOCHS, batch_size=1024, hidden=128,
            model_dir=model_dir, verbose=False,
        )
        t_bilstm = time.perf_counter() - t0
        epoch_s = [log.seconds for log in result.logs]

        # ---- stage 4: GMM-UBM + MAP (train/gmm_system settings) ----
        frames = x_train.reshape(-1, x_train.shape[-1])  # (~1.78M, 19) on device
        t0 = time.perf_counter()
        ubm = fit_em(frames, 128, max_iter=100, var_floor_rel=1e-3, seed=42)
        float(jnp.sum(ubm.means))
        t_ubm = time.perf_counter() - t0

        frame_labels = np.repeat(y_train, x_train.shape[1])
        # weights pre-placed and MAP jitted (the product path's form):
        # eager map_adapt is ~15 op-by-op tunnel RPCs per class, and the
        # two ~7 MB weight uploads over the 20-40 MB/s tunnel would
        # otherwise sit INSIDE the timed region
        w_g = jax.device_put((frame_labels == 0).astype(np.float32))
        w_s = jax.device_put((frame_labels == 1).astype(np.float32))
        map_jit = jax.jit(
            lambda g, x, fw: map_adapt(
                g, x, frame_weights=fw, adapt_vars=False, adapt_weights=False
            )
        )
        float(jnp.sum(map_jit(ubm, frames, w_g).means))  # compile + force
        t0 = time.perf_counter()
        gmm_g = map_jit(ubm, frames, w_g)
        gmm_s = map_jit(ubm, frames, w_s)
        float(jnp.sum(gmm_g.means) + jnp.sum(gmm_s.means))
        t_map = time.perf_counter() - t0

        # ---- stage 5: fused eval over the 2066-utterance test set ----
        model, variables = load_bilstm_model(model_dir, hidden=128)
        scorer = make_fused_scorer(model.apply, variables, gmm_g, gmm_s)
        # compile outside the timed region, FORCED — an unfetched warm-up
        # executes asynchronously straight into t_eval on this runtime
        float(jnp.sum(scorer(jnp.zeros((1033, 63, 19)))))
        t0 = time.perf_counter()
        _, _, fused_metrics = eval_fused(scorer, x_eval, y_eval, batch_size=1033)
        t_eval = time.perf_counter() - t0

    n_train = 2 * N_TRAIN_PER_CLASS
    n_eval = 2 * N_EVAL_PER_CLASS
    ref_timed = REF_UBM_S + REF_MAP_S + REF_EVAL_S
    ours_timed = t_ubm + t_map + t_eval
    total = t_extract + t_scale + t_bilstm + ours_timed
    print(json.dumps({
        "metric": "flagship_scale_timed_stages_seconds",
        "value": round(ours_timed, 2),
        "unit": "s",
        "vs_baseline": round(ref_timed / ours_timed, 1),
        "scale": {"n_train": n_train, "n_eval": n_eval,
                  "gmm_frames": n_train * 63, "epochs": EPOCHS},
        "stages": {
            "extract_cqcc_s": round(t_extract, 2),
            "scaler_s": round(t_scale, 2),
            "bilstm_train_s": round(t_bilstm, 2),
            "bilstm_epoch_s_median": round(float(np.median(epoch_s)), 3),
            "ubm_em_s": round(t_ubm, 2),
            "map_adapt_s": round(t_map, 2),
            "fused_eval_s": round(t_eval, 2),
        },
        # one-time costs, excluded from stages: extract compile/cache-load,
        # and the 1-epoch warm-up fit that primes the train/eval-step cache.
        # bilstm_train_s still includes fit()'s per-epoch host work (metric
        # fetch, val pass, best/worst checkpoint device_get) — on this
        # harness those ride a ~20-40 MB/s tunnel, so the steady-state
        # compute signal is bilstm_epoch_s_median x epochs.
        "setup": {
            "extract_compile_s": round(t_compile_extract, 2),
            "bilstm_warmup_fit_s": round(t_compile_bilstm, 2),
        },
        "reference": {"ubm_em_s": REF_UBM_S, "map_adapt_s": REF_MAP_S,
                      "fused_eval_s": REF_EVAL_S,
                      "bilstm": "interrupted at 2 epochs, no total published"},
        "speedups": {
            "ubm_em": round(REF_UBM_S / t_ubm, 1),
            "map_adapt": round(REF_MAP_S / t_map, 1),
            "fused_eval": round(REF_EVAL_S / t_eval, 1),
            "eval_utt_s": round(n_eval / t_eval, 1),
        },
        "total_wall_s_incl_training": round(total, 2),
        "sanity_metrics": {"bilstm": bilstm_metrics, "fused": fused_metrics},
    }))


if __name__ == "__main__":
    main()
