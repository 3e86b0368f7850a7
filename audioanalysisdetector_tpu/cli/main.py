"""Command-line entry points (L7) — the reference has none (notebooks only).

Subcommands map onto BASELINE.json's five runnable configs:

  score       #1 log-mel + CNN-BiLSTM bonafide/spoof scoring over WAVs
  extract     #2 feature extraction (mfcc/cqcc/lfcc/gtcc/wpt/mel) to .npz
  augment     #3 on-device augmentation demo: writes augmented WAVs
  train       #4 CNN-BiLSTM training run (data-parallel over local devices)
  xai         #5 saliency + Grad-CAM heatmap PNGs for a WAV
  train-fused    GMM(+)BiLSTM flagship system: CQCC -> BiLSTM + GMM-UBM -> fused EER
  train-asvspoof metadata-driven flagship recipe on an ASVspoof-layout corpus
  train-3features  shared-trunk (cqcc,gtcc,mfcc) fusion net (notebook cells 32-33)
  train-mfca     MobileNetV2+MFCA on log-mel (notebook cells 29-31)
  gridsearch     classical SVM/XGB sweep over expanded scalar features
  classical      metadata-driven classical pipeline (6 features incl. formants)
  serve          HTTP scoring service: dynamic micro-batching in front of the chip

All paths accept a directory of WAV/FLAC files or a glob. Everything is CPU-runnable
(slow) and TPU-native (fast) with the same code.
"""

from __future__ import annotations

import argparse
import glob as globlib
import json
import os
import sys
import time

import numpy as np


def _collect_wavs(path: str) -> list[str]:
    """All WAV/FLAC files under a directory, or a glob's matches."""
    if os.path.isdir(path):
        return sorted(
            globlib.glob(os.path.join(path, "**", "*.wav"), recursive=True)
            + globlib.glob(os.path.join(path, "**", "*.flac"), recursive=True)
        )
    return sorted(globlib.glob(path))


def _require_decoded(paths: list[str], n_min: int) -> bool:
    """Re-validate corpus size AFTER decode drops unreadable files — the
    pre-decode count check alone lets a mostly-corrupt directory shrink
    below the minimum and crash deep in fit/evaluate with a shape error."""
    if len(paths) >= n_min:
        return True
    print(
        f"only {len(paths)} files decoded successfully — need at least {n_min}",
        file=sys.stderr,
    )
    return False


def _load_batch(paths: list[str], seconds: float, sr: int) -> tuple[list[str], np.ndarray]:
    """Decode fixed-length clips; unreadable files are dropped with a warning.

    Returns (kept_paths, (B, n) float32) so labels stay aligned with rows.
    Uses the threaded native decoder (WAV + in-repo FLAC, Python fallback
    per row) — the same failure->skip policy as the streaming scorer.
    """
    from audioanalysisdetector_tpu.io.native_loader import load_chunk_batch_native

    out, ok = load_chunk_batch_native(
        paths,
        [0.0] * len(paths),
        [float(seconds)] * len(paths),
        sr=sr,
        return_ok=True,
    )
    for p, good in zip(paths, ok):
        if not good:
            print(f"WARNING: cannot read {p}: skipped", file=sys.stderr)
    kept = [p for p, good in zip(paths, ok) if good]
    return kept, out[ok]


def _mel_cfg(args):
    """Mel config from CLI flags: the librosa-parity default, or the ~2.2x
    faster speech-standard resolution (frontend.mel.MelConfig.for_speech).
    Train and score with the SAME profile — features must match."""
    from audioanalysisdetector_tpu.frontend.mel import MelConfig

    return MelConfig.for_profile(
        getattr(args, "mel_profile", "parity"), args.sr, n_mels=args.n_mels
    )


def cmd_score(args) -> int:
    from audioanalysisdetector_tpu.score.e2e import (
        init_mel_cnn_bilstm,
        make_mel_cnn_bilstm_scorer,
    )

    if not args.checkpoint and not args.allow_random:
        print(
            "score: no --checkpoint given — scores from randomly initialized "
            "weights are meaningless. Pass --checkpoint <best_model.msgpack>, "
            "or --allow-random to proceed anyway (smoke tests only).",
            file=sys.stderr,
        )
        return 2
    paths = _collect_wavs(args.audio)
    if not paths:
        print(f"no WAV files under {args.audio}", file=sys.stderr)
        return 1
    mel_cfg = _mel_cfg(args)
    # model init + checkpoint contract shared with `serve` (score.e2e)
    model, variables = init_mel_cnn_bilstm(
        mel_cfg, int(args.seconds * args.sr), checkpoint=args.checkpoint
    )
    from audioanalysisdetector_tpu.score.streaming import score_paths

    scorer = make_mel_cnn_bilstm_scorer(model.apply, variables, mel_cfg)
    kept, scores = score_paths(
        scorer, paths, seconds=args.seconds, sr=args.sr, batch_size=args.batch_size
    )
    for p, s in zip(kept, scores):
        print(json.dumps({"file": p, "spoof_score": float(s), "label": int(s > 0.5)}))
    return 0


def cmd_extract(args) -> int:
    import jax
    import jax.numpy as jnp

    from audioanalysisdetector_tpu.data.pipeline import default_extractors

    paths = _collect_wavs(args.audio)
    if not paths:
        print(f"no WAV files under {args.audio}", file=sys.stderr)
        return 1
    registry = default_extractors(args.sr)
    if args.feature not in registry:
        print(f"unknown feature {args.feature}; options: {sorted(registry)}", file=sys.stderr)
        return 1
    # streaming batches like `score`: threaded decode overlaps device
    # compute. Feature tensors are large (unlike score's (B,) vectors), so
    # only a 2-batch window stays device-resident — older batches are
    # fetched to host as new ones dispatch, keeping HBM use constant
    from audioanalysisdetector_tpu.score.streaming import stream_decode_batches

    # ONE jitted program for the extractor — the registry fns are plain
    # traceable lambdas, and eager per-op dispatch through the TPU tunnel
    # is pathological (CLAUDE.md: one un-jitted _decimate2 took ~106 s)
    feature_fn = jax.jit(registry[args.feature])
    kept_all: list[str] = []
    host_parts: list[np.ndarray] = []
    window: list[tuple[int, object]] = []
    for kept, batch_np in stream_decode_batches(
        paths, seconds=args.seconds, sr=args.sr, batch_size=args.batch_size
    ):
        kept_all.extend(kept)
        window.append((len(kept), feature_fn(jnp.asarray(batch_np))))
        if len(window) > 2:
            n, f = window.pop(0)
            host_parts.append(np.asarray(f)[:n])
    host_parts.extend(np.asarray(f)[:n] for n, f in window)
    if not host_parts:
        print("no decodable audio files — nothing extracted", file=sys.stderr)
        return 1
    feats = np.concatenate(host_parts)
    np.savez(args.output, features=feats, files=np.asarray(kept_all))
    print(f"wrote {feats.shape} {args.feature} features to {args.output}")
    return 0


def cmd_augment(args) -> int:
    import jax
    import jax.numpy as jnp

    from audioanalysisdetector_tpu.data.augment import add_noise, pitch_shift, time_shift
    from audioanalysisdetector_tpu.io.audio import write_wav

    paths = _collect_wavs(args.audio)
    if not paths:
        print(f"no WAV files under {args.audio}", file=sys.stderr)
        return 1
    paths, wav_np = _load_batch(paths, args.seconds, args.sr)
    wav = jnp.asarray(wav_np)
    os.makedirs(args.output_dir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    # one compiled dispatch for all three variants (eager repo jnp calls
    # dispatch op-by-op through the TPU tunnel; the phase-vocoder pitch
    # shift alone is hundreds of ops)
    @jax.jit
    def make_variants(w, k):
        return {
            "noise": add_noise(w, k, factor=args.noise_factor),
            "pitch": pitch_shift(w, n_steps=args.pitch_steps),
            "shift": time_shift(w, k),
        }

    variants = make_variants(wav, key)
    for name, batch in variants.items():
        for p, y in zip(paths, np.asarray(batch)):
            base = os.path.splitext(os.path.basename(p))[0]
            write_wav(os.path.join(args.output_dir, f"{base}_{name}.wav"), y, args.sr)
    print(f"wrote {len(paths) * len(variants)} augmented files to {args.output_dir}")
    return 0



def _shuffle(paths: list[str], seed: int) -> list[str]:
    """Deterministic shuffle before head/tail splits — sorted collection
    groups labels by directory, which would otherwise yield one-class splits."""
    idx = np.random.default_rng(seed).permutation(len(paths))
    return [paths[i] for i in idx]

def _labels_from_dirnames(paths: list[str]) -> np.ndarray:
    """label = 1 iff any parent directory is named 'spoof'/'fake'."""
    return np.asarray(
        [1 if any(seg in ("spoof", "fake") for seg in p.split(os.sep)) else 0 for p in paths],
        dtype=np.int64,
    )


def cmd_train(args) -> int:
    import jax
    import jax.numpy as jnp

    from audioanalysisdetector_tpu.frontend.mel import log_mel_spectrogram
    from audioanalysisdetector_tpu.models.cnn_bilstm import CNNBiLSTMHybrid
    from audioanalysisdetector_tpu.train import (
        TrainState,
        evaluate,
        fit,
        make_optimizer,
        would_use_dp,
    )

    paths = _collect_wavs(args.audio)
    if len(paths) < 4:
        print("need at least 4 WAVs (with 'spoof'/'fake' dirs for labels)", file=sys.stderr)
        return 1
    paths = _shuffle(paths, args.seed)
    paths, wav = _load_batch(paths, args.seconds, args.sr)
    if not _require_decoded(paths, 4):
        return 1
    y = _labels_from_dirnames(paths)
    mel_cfg = _mel_cfg(args)
    feats = np.asarray(jax.jit(lambda w: log_mel_spectrogram(w, mel_cfg))(jnp.asarray(wav)))
    split = max(int(len(paths) * 0.8), 1)
    # Data parallelism over local devices: fit() auto-shards only BN-free
    # models (per-shard BN forward would silently change numerics), so for
    # the BatchNorm hybrid we opt in EXPLICITLY with a sync-BN model — the
    # bn_axis_name pmean makes the sharded step numerically the global-batch
    # step (train/loop._pick_dp_mesh).
    use_dp = would_use_dp(args.batch_size)  # same decision fit() will make
    model = CNNBiLSTMHybrid(logits=True, bn_axis_name="data" if use_dp else None)
    variables = model.init(jax.random.PRNGKey(args.seed), jnp.asarray(feats[:1]), train=False)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=make_optimizer(args.optimizer, args.lr),
        batch_stats=variables["batch_stats"],
    )
    result = fit(
        state, (feats[:split], y[:split]), (feats[split:], y[split:]),
        loss_name="BCELoss", num_epochs=args.epochs, batch_size=args.batch_size,
        run_dir=args.run_dir, binary_head=True, verbose=True,
        data_parallel=True if use_dp else None,
    )
    metrics = evaluate(
        result.best_state, (feats[split:], y[split:]), loss_name="BCELoss", binary_head=True
    )
    print(json.dumps(metrics))
    return 0


def cmd_xai(args) -> int:
    import jax
    import jax.numpy as jnp

    from audioanalysisdetector_tpu.frontend.mel import MelConfig, log_mel_spectrogram
    from audioanalysisdetector_tpu.models.resnet import AntiSpoofingResNet
    from audioanalysisdetector_tpu.xai import (
        grad_cam,
        integrated_gradients,
        lime_single_instance,
        occlusion,
        plot_heatmaps,
        saliency,
    )

    paths = _collect_wavs(args.audio)[:1]
    if not paths:
        print(f"no WAV files under {args.audio}", file=sys.stderr)
        return 1
    paths, wav = _load_batch(paths, args.seconds, args.sr)
    if not paths:
        print("no readable WAV files", file=sys.stderr)
        return 1
    mel_cfg = MelConfig(sr=args.sr, n_mels=args.n_mels)
    feats = jax.jit(lambda w: log_mel_spectrogram(w, mel_cfg))(jnp.asarray(wav))
    model = AntiSpoofingResNet()
    variables = model.init(jax.random.PRNGKey(0), feats, train=False)

    # every attribution runs as ONE jitted program — the library fns are
    # pure/traceable, but eager evaluation dispatches the ResNet forward/
    # backward op-by-op through the TPU tunnel (CLAUDE.md hazard)
    methods = args.methods.split(",")
    heatmaps = {}
    if "saliency" in methods:
        sal = jax.jit(lambda v, f: saliency(model.apply, v, f))(variables, feats)
        heatmaps["saliency"] = np.asarray(sal[0]).T  # (F,T) -> plot contract (T,F)
    if "gradcam" in methods:
        cam = jax.jit(
            lambda v, f: grad_cam(model, v, f, output_size=feats.shape[-2:])
        )(variables, feats)
        heatmaps["grad_cam"] = np.asarray(cam[0]).T
        # the notebook's overlay-on-mel-axes figure (cell 34)
        from audioanalysisdetector_tpu.xai import plot_gradcam_overlay

        overlay_path = plot_gradcam_overlay(
            np.asarray(feats[0]), np.asarray(cam[0]), sr=args.sr,
            hop_length=mel_cfg.hop_length, fmax=mel_cfg.fmax,
            out_path=os.path.join(args.output_dir, "gradcam_overlay.png"),
        )
    if "ig" in methods:
        ig = jax.jit(
            lambda v, f: integrated_gradients(model.apply, v, f, steps=args.ig_steps)
        )(variables, feats)
        heatmaps["integrated_gradients"] = np.abs(np.asarray(ig[0])).T
    if "occlusion" in methods:
        # feats are coeffs-first (B, n_mels, T); the reference's (5, 1)
        # window means 5 TIME frames x 1 coefficient (tets_xai.py:84), so
        # on this layout the window is (1 mel bin, 5 frames)
        occ = jax.jit(
            lambda v, f: occlusion(model.apply, v, f, window=(1, 5))
        )(variables, feats)
        heatmaps["occlusion"] = np.asarray(occ[0]).T
    if "lime" in methods:
        @jax.jit
        def scorer(batch):
            logits = model.apply(variables, batch, train=False)
            return jax.nn.softmax(logits, axis=-1)[:, 1]

        lime = lime_single_instance(
            scorer, np.asarray(feats[0]), n_perturbations=args.lime_perturbations,
        )
        print(json.dumps({
            "lime_top_components": lime["top_components"],
            "lime_score": lime["score"],
            "lime_label": lime["label"],
        }))
    out = plot_heatmaps(
        heatmaps, args.output_dir,
        prefix=os.path.splitext(os.path.basename(paths[0]))[0],
    )
    if "gradcam" in methods:
        out.append(overlay_path)
    if args.html:
        from audioanalysisdetector_tpu.xai import write_explanation_html

        probs = jax.jit(
            lambda v, f: jax.nn.softmax(model.apply(v, f, train=False), axis=-1)
        )(variables, feats)
        out.append(
            write_explanation_html(
                os.path.join(args.output_dir, "explanation.html"),
                score=float(probs[0, 1]),
                heatmaps=heatmaps,
                title=f"Explanation: {os.path.basename(paths[0])}",
            )
        )
    print("\n".join(out))
    return 0


def _eval_fused_system(
    best_state, g_gen, g_spoof, tr, y_tr, te, y_te, *,
    batch_size: int, weight: float | str = 0.5, calibrate: bool = False,
    gmm_deltas: bool = False, gmm_cmvn: bool = False,
):
    """Shared fused-system evaluation: per-arm diagnostics + fused metrics.

    Returns (gmm_metrics, fused_metrics, calibration) where ``gmm_metrics``
    is the GMM arm alone (LLR-ranking EER — if this is ~0.5 the arm
    contributes noise and fusion CANNOT help; see round-2 regression) and
    ``calibration`` is the (scale, bias, weight) used (1, 0, w unless
    ``calibrate``/auto-weight).

    ``weight="auto"`` selects the BiLSTM fusion weight on the TRAIN split
    (EER of the calibrated blend, ties toward the reference's 0.5); the
    reference's literal 0.5/0.5 stays the default
    (reference/ASV_dl_func.py:1448-1462). ``gmm_deltas`` scores the GMM arm
    on CQCC+Δ+ΔΔ frames (must match ``train_gmm_system(deltas=True)``).

    ONE device pass per split: the arms (BiLSTM prob, LLR, empty mask) are
    the expensive part; the fused score is a host-side formula of them
    (``score.fused.fused_scores`` computes the identical blend on device —
    used by the streaming scorers where the arms aren't needed separately).
    """
    import jax.numpy as jnp

    from audioanalysisdetector_tpu.score import (
        fit_decision_threshold,
        fit_llr_calibration,
        make_arm_scorer,
    )
    from audioanalysisdetector_tpu.train import metrics as M
    from audioanalysisdetector_tpu.train.gmm_system import make_gmm_feature_fn

    apply_fn, variables = best_state.apply_fn, {"params": best_state.params}
    arms = make_arm_scorer(
        apply_fn, variables, g_gen, g_spoof,
        gmm_feature_fn=make_gmm_feature_fn(deltas=gmm_deltas, cmvn=gmm_cmvn),
    )

    def run_arms(x):
        ps, ls, es = [], [], []
        for s in range(0, len(x), batch_size):
            xb = x[s : s + batch_size]
            nb = len(xb)
            if nb < batch_size:
                xb = np.concatenate([xb, np.repeat(xb[-1:], batch_size - nb, axis=0)])
            p, l, e = arms(jnp.asarray(xb))
            ps.append(np.asarray(p)[:nb])
            ls.append(np.asarray(l)[:nb])
            es.append(np.asarray(e)[:nb])
        return np.concatenate(ps), np.concatenate(ls), np.concatenate(es)

    def blend(p, llr, empty, w):
        z = np.clip(scale * llr + bias, -30.0, 30.0)
        f = w * p + (1.0 - w) / (1.0 + np.exp(-z))
        return np.where(empty, 0.5, f)  # empty-sequence rule, fused.py

    scale, bias = 1.0, 0.0
    op_threshold = 0.5  # the reference's decision contract
    auto_weight = weight == "auto"
    w = 0.5 if auto_weight else float(weight)
    if calibrate or auto_weight:
        p_tr, llr_tr, empty_tr = run_arms(tr)
        if calibrate:
            scale, bias = fit_llr_calibration(llr_tr, y_tr)
        if auto_weight:
            # fusion weight from the TRAIN split: minimize the calibrated
            # blend's EER, ties toward the reference's 0.5 contract
            cands = np.round(np.linspace(0.0, 1.0, 21), 3)
            eers = np.array(
                [M.eer(y_tr, blend(p_tr, llr_tr, empty_tr, c)) for c in cands]
            )
            w = float(cands[np.lexsort((np.abs(cands - 0.5), eers))[0]])
        if calibrate:
            # operating point from the TRAIN split: with calibrated but
            # asymmetric arms the fused score can rank perfectly while the
            # fixed 0.5 line sits off-center (score.fused.fit_decision_threshold)
            op_threshold = fit_decision_threshold(
                blend(p_tr, llr_tr, empty_tr, w), y_tr
            )
    p_te, llr_te, empty_te = run_arms(te)
    gmm_metrics = {"eer": M.eer(y_te, llr_te)}
    fused = blend(p_te, llr_te, empty_te, w)
    y_pred = (fused > 0.5).astype(np.int64)
    fused_metrics = {
        "accuracy": M.accuracy(y_te, y_pred),
        "f1": M.f1_binary(y_te, y_pred),
        "eer": M.eer(y_te, fused),
    }
    if auto_weight:
        fused_metrics["fusion_weight"] = w
    if calibrate:
        y_op = (fused > op_threshold).astype(np.int64)
        fused_metrics["op_threshold"] = float(op_threshold)
        fused_metrics["accuracy_at_op"] = M.accuracy(y_te, y_op)
        fused_metrics["f1_at_op"] = M.f1_binary(y_te, y_op)
    fused_metrics["_eval_scores"] = fused  # per-chunk fused scores for
    # per-tier decomposition; stripped before JSON output
    return gmm_metrics, fused_metrics, (scale, bias, w)


def _per_tier_eer(y: np.ndarray, scores: np.ndarray, attack: np.ndarray) -> dict:
    """EER of each spoof system vs ALL bonafide chunks — the ASVspoof
    challenge's own decomposition of the pooled number (each A0x column of
    the official result tables)."""
    from audioanalysisdetector_tpu.train import metrics as M

    y = np.asarray(y)
    bona = y == 0
    out = {}
    for tier in sorted(set(attack[y == 1])):
        sel = bona | ((y == 1) & (attack == tier))
        out[str(tier)] = M.eer(y[sel], scores[sel])
    return out


def cmd_train_fused(args) -> int:
    import jax.numpy as jnp

    from audioanalysisdetector_tpu.frontend.cqcc import CQCCConfig, cqcc, transpose_cqcc
    from audioanalysisdetector_tpu.data.scaler import prepare_train_test_data
    from audioanalysisdetector_tpu.train.gmm_system import train_gmm_system
    from audioanalysisdetector_tpu.train.loop import bilstm_pipeline

    paths = _collect_wavs(args.audio)
    if len(paths) < 8:
        print("need at least 8 labeled WAVs", file=sys.stderr)
        return 1
    paths = _shuffle(paths, args.seed)
    paths, wav = _load_batch(paths, args.seconds, args.sr)
    if not _require_decoded(paths, 8):
        return 1
    y = _labels_from_dirnames(paths)
    import jax

    cfg = CQCCConfig.for_sr(args.sr)
    feats = np.asarray(
        jax.jit(lambda w: transpose_cqcc(cqcc(w, cfg)))(jnp.asarray(wav))
    )
    split = max(int(len(paths) * 0.8), 2)
    os.makedirs(args.run_dir, exist_ok=True)
    tr, te, scaler = prepare_train_test_data(
        feats[:split], feats[split:], scaler_path=os.path.join(args.run_dir, "scaler.npz")
    )
    result, bilstm_metrics = bilstm_pipeline(
        (tr, y[:split]), (te, y[split:]),
        num_epochs=args.epochs, lr=args.lr, batch_size=args.batch_size,
        hidden=args.hidden, model_dir=args.run_dir,
    )
    _, g_gen, g_spoof = train_gmm_system(
        tr, y[:split], n_components=args.gmm_components, model_dir=args.run_dir,
        adapt_mode=args.map_adapt, deltas=args.gmm_deltas, cmvn=args.gmm_cmvn,
    )
    gmm_metrics, fused_metrics, _ = _eval_fused_system(
        result.best_state, g_gen, g_spoof, tr, y[:split], te, y[split:],
        batch_size=args.batch_size, weight=args.fusion_weight,
        calibrate=args.calibrate_llr, gmm_deltas=args.gmm_deltas,
        gmm_cmvn=args.gmm_cmvn,
    )
    fused_metrics.pop("_eval_scores", None)
    print(json.dumps({
        "bilstm": bilstm_metrics, "gmm": gmm_metrics, "fused": fused_metrics,
    }))
    return 0


def cmd_train_asvspoof(args) -> int:
    """The reference's flagship recipe, METADATA-driven — one command on a
    real ASVspoof LA tree (or the synthetic surrogate corpus): metadata +
    FLAC/WAV folders -> 2-s chunks -> CQCC -> balance -> scale -> BiLSTM ->
    GMM-UBM + MAP -> fused eval (ASV_deep_learning.ipynb cells 22-25)."""
    from audioanalysisdetector_tpu.data.scaler import prepare_train_test_data
    from audioanalysisdetector_tpu.train.gmm_system import train_gmm_system
    from audioanalysisdetector_tpu.train.loop import bilstm_pipeline
    from audioanalysisdetector_tpu.train.quality import build_cqcc_arrays

    os.makedirs(args.run_dir, exist_ok=True)

    def build(metadata: str, name: str):
        return build_cqcc_arrays(
            metadata, args.audio_dir, name=name, sr=args.sr,
            sample_size=args.sample_size, extension=args.extension,
            rescue_dir=args.run_dir, seed=args.seed, balance=name == "train",
            return_attack=name == "eval",
            augment=args.augment and name == "train",
        )

    x_tr, y_tr = build(args.train_metadata, "train")
    x_te, y_te, attack_te = build(args.eval_metadata, "eval")
    tr, te, _ = prepare_train_test_data(
        x_tr, x_te, scaler_path=os.path.join(args.run_dir, "scaler.npz")
    )
    result, bilstm_metrics = bilstm_pipeline(
        (tr, y_tr), (te, y_te),
        num_epochs=args.epochs, lr=args.lr, batch_size=args.batch_size,
        hidden=args.hidden, model_dir=args.run_dir, seed=args.seed,
    )
    _, g_gen, g_spoof = train_gmm_system(
        tr, y_tr, n_components=args.gmm_components, model_dir=args.run_dir,
        adapt_mode=args.map_adapt, deltas=args.gmm_deltas, cmvn=args.gmm_cmvn,
    )
    gmm_metrics, fused_metrics, calibration = _eval_fused_system(
        result.best_state, g_gen, g_spoof, tr, y_tr, te, y_te,
        batch_size=args.batch_size, weight=args.fusion_weight,
        calibrate=args.calibrate_llr, gmm_deltas=args.gmm_deltas,
        gmm_cmvn=args.gmm_cmvn,
    )
    fused_scores = fused_metrics.pop("_eval_scores")
    if set(attack_te) - {"-", "bonafide", "nan"}:
        fused_metrics["per_tier_eer"] = _per_tier_eer(y_te, fused_scores, attack_te)
    print(json.dumps({
        "bilstm": bilstm_metrics, "gmm": gmm_metrics, "fused": fused_metrics,
        "n_train": int(len(y_tr)), "n_eval": int(len(y_te)),
        "calibration": {
            "scale": calibration[0], "bias": calibration[1],
            "weight": calibration[2],
        },
    }))
    return 0


def cmd_train_3features(args) -> int:
    """Shared-trunk 3-feature fusion net (cqcc, gtcc, mfcc) — the notebook's
    ``train_loop_3features`` recipe (ASV_deep_learning.ipynb cells 32-33)."""
    import jax.numpy as jnp

    from audioanalysisdetector_tpu.frontend import (
        CepstralConfig, CQCCConfig, MFCCConfig, cqcc, gfcc, mfcc,
    )
    from audioanalysisdetector_tpu.train.sweep import train_3features

    paths = _collect_wavs(args.audio)
    if len(paths) < 8:
        print("need at least 8 labeled WAVs", file=sys.stderr)
        return 1
    paths = _shuffle(paths, args.seed)
    paths, wav = _load_batch(paths, args.seconds, args.sr)
    if not _require_decoded(paths, 8):
        return 1
    y = _labels_from_dirnames(paths)
    # one jitted dispatch for all three frontends (eager repo jnp calls
    # dispatch op-by-op through the TPU tunnel — minutes per batch)
    import jax

    @jax.jit
    def featurize(w):
        return (
            cqcc(w, CQCCConfig.for_sr(args.sr)),
            # gtcc stays in its spafe (T, 13) layout — the reference's
            # MultiFeatureDataset feeds raw gfcc cells the same way
            # (reference/ASV_dl_func.py:643-651; the trunk is shape-agnostic)
            gfcc(w, CepstralConfig(fs=args.sr, nfilts=40, fb_kind="gammatone")),
            mfcc(w, MFCCConfig.for_sr(args.sr)),
        )

    feats = tuple(np.asarray(f) for f in featurize(jnp.asarray(wav)))
    split = max(int(len(paths) * 0.8), 2)
    out = train_3features(
        tuple(f[:split] for f in feats), y[:split],
        tuple(f[split:] for f in feats), y[split:],
        epochs=args.epochs, lr=args.lr, batch_size=args.batch_size,
        out_dir=args.run_dir, seed=args.seed,
    )
    print(json.dumps(out["best"]))
    return 0


def cmd_train_mfca(args) -> int:
    """MobileNetV2+MFCA on log-mel spectrograms — the notebook's
    ``train_loop_mfca`` recipe (ASV_deep_learning.ipynb cells 29-31)."""
    import jax
    import jax.numpy as jnp

    from audioanalysisdetector_tpu.frontend.mel import MelConfig, log_mel_spectrogram
    from audioanalysisdetector_tpu.train.sweep import train_mfca

    paths = _collect_wavs(args.audio)
    if len(paths) < 8:
        print("need at least 8 labeled WAVs", file=sys.stderr)
        return 1
    paths = _shuffle(paths, args.seed)
    paths, wav = _load_batch(paths, args.seconds, args.sr)
    if not _require_decoded(paths, 8):
        return 1
    y = _labels_from_dirnames(paths)
    mel_cfg = MelConfig(sr=args.sr, n_mels=args.n_mels)
    feats = np.asarray(
        jax.jit(lambda w: log_mel_spectrogram(w, mel_cfg))(jnp.asarray(wav))
    )
    split = max(int(len(paths) * 0.8), 2)
    out = train_mfca(
        feats[:split], y[:split], feats[split:], y[split:],
        epochs=args.epochs, lr=args.lr, batch_size=args.batch_size,
        out_dir=args.run_dir, seed=args.seed,
    )
    print(json.dumps(out["best"]))
    return 0


def cmd_classical(args) -> int:
    """Metadata-driven classical-ML end-to-end (reference/train_fun.py:305-403):
    sample caps, 6-feature extraction incl. formants, dict expansion,
    PCA+SVC / PCA+XGB grids with pipeline caching."""
    from audioanalysisdetector_tpu.train.classical import classical_main

    all_data = {}
    if args.config:
        # reference-style config.yaml: datasets.{KEY}.{metadata, flac}
        # (reference/train_fun.py:30-44; schema in io/config.py)
        from audioanalysisdetector_tpu.io.config import load_config

        cfg = load_config(args.config)
        for key, block in cfg.get("datasets", {}).items():
            flac = block["flac"]
            all_data[key] = {
                "metadata": block["metadata"],
                "flac": list(flac) if isinstance(flac, list) else [flac],
            }
    for spec in args.dataset or []:
        try:
            key, metadata, audio_dir = spec.split(":", 2)
        except ValueError:
            print(f"bad --dataset spec {spec!r}; use KEY:METADATA:AUDIO_DIR",
                  file=sys.stderr)
            return 2
        entry = all_data.setdefault(key, {"metadata": metadata, "flac": []})
        entry["flac"].append(audio_dir)
    if not all_data:
        print("classical: provide --dataset specs and/or --config", file=sys.stderr)
        return 2
    features = tuple(f.strip() for f in args.features.split(",") if f.strip())
    try:
        out = classical_main(
            all_data,
            sr=args.sr,
            seconds=args.seconds,
            features=features,
            pca_components=tuple(int(c) for c in args.components.split(",") if c.strip()),
            extension=args.extension,
            cache_dir=args.cache_dir,
            seed=args.seed,
        )
    except ValueError as e:
        print(f"classical: {e}", file=sys.stderr)
        return 1
    print(json.dumps(out))
    return 0


def _serve_multiprocess(args) -> int:
    """--workers N > 1: SO_REUSEPORT scale-out (serve/multiproc.py). One
    spawned process owns the chip + batcher; N HTTP workers share the port
    and forward rows to it, so the host-side parse/decode ceiling scales
    with cores while batching still aggregates globally."""
    from audioanalysisdetector_tpu.serve.multiproc import MultiprocessServer
    from audioanalysisdetector_tpu.serve.server import default_bucket_ladder

    if args.buckets:
        buckets = tuple(int(b) for b in args.buckets.split(","))
    else:
        buckets = default_bucket_ladder(args.max_batch)
    srv = MultiprocessServer(
        workers=args.workers,
        sr=args.sr,
        host=args.host,
        port=args.port,
        factory_kwargs=dict(
            checkpoint=args.checkpoint,
            sr=args.sr,
            seconds=args.seconds,
            n_mels=args.n_mels,
            mel_profile=args.mel_profile,
            data_parallel={"auto": None, "on": True, "off": False}[
                args.data_parallel
            ],
        ),
        batcher_kwargs=dict(
            max_batch=args.max_batch,
            max_wait_ms=args.max_wait_ms,
            bucket_sizes=buckets,
            adaptive=not args.no_adaptive,
        ),
    )
    srv.start()
    print(
        json.dumps(
            {
                "listening": f"http://{args.host}:{srv.port}",
                "endpoints": ["/v1/score", "/v1/score_raw", "/v1/stats", "/healthz"],
                "workers": args.workers,
                "max_batch": args.max_batch,
                "buckets": list(buckets),
            }
        ),
        flush=True,
    )
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass
    finally:
        srv.close()
    return 0


def cmd_serve(args) -> int:
    """HTTP scoring service: dynamic micro-batching in front of the chip
    (serve/server.py). Warm up the compile, bind, serve until SIGINT."""
    from audioanalysisdetector_tpu.serve import BatchingScorer, ScoreServer, build_mel_scorer

    if not args.checkpoint and not args.allow_random:
        print(
            "serve: no --checkpoint given — scores from randomly initialized "
            "weights are meaningless. Pass --checkpoint <best_model.msgpack>, "
            "or --allow-random to proceed anyway (smoke tests only).",
            file=sys.stderr,
        )
        return 2
    if args.workers > 1:
        return _serve_multiprocess(args)
    scorer, n_samples = build_mel_scorer(
        checkpoint=args.checkpoint,
        sr=args.sr,
        seconds=args.seconds,
        n_mels=args.n_mels,
        mel_profile=args.mel_profile,
        data_parallel={"auto": None, "on": True, "off": False}[args.data_parallel],
    )
    if args.buckets:
        buckets = tuple(int(b) for b in args.buckets.split(","))
    else:
        from audioanalysisdetector_tpu.serve.server import default_bucket_ladder

        buckets = default_bucket_ladder(args.max_batch)
    batcher = BatchingScorer(
        scorer,
        n_samples=n_samples,
        max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
        bucket_sizes=buckets,
        adaptive=not args.no_adaptive,
    )
    # compile every bucket before accepting traffic so no request is a
    # 30 s+ cold-compile hostage (the ladder is the full set of shapes)
    batcher.warm_up()
    server = ScoreServer(batcher, sr=args.sr, host=args.host, port=args.port)
    print(
        json.dumps(
            {
                "listening": f"http://{args.host}:{server.port}",
                "endpoints": ["/v1/score", "/v1/score_raw", "/v1/stats", "/healthz"],
                "max_batch": args.max_batch,
                "buckets": list(batcher.bucket_sizes),
                "n_samples": n_samples,
                "adaptive": batcher.adaptive,
                "data_parallel_devices": getattr(scorer, "row_multiple", 1),
            }
        ),
        flush=True,
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.close()
    return 0


def cmd_gridsearch(args) -> int:
    from audioanalysisdetector_tpu.data.pipeline import extract_features
    from audioanalysisdetector_tpu.train.classical import (
        expand_feature_columns,
        run_extensive_gridsearch,
    )
    import pandas as pd

    paths = _collect_wavs(args.audio)
    if len(paths) < 10:
        print("need at least 10 labeled WAVs", file=sys.stderr)
        return 1
    paths = _shuffle(paths, args.seed)
    features = [f.strip() for f in args.features.split(",") if f.strip()]
    components = tuple(int(c) for c in args.components.split(",") if c.strip())
    df = pd.DataFrame({"file_path": paths})
    df["label"] = _labels_from_dirnames(paths)
    df["chunk_start"], df["chunk_end"] = 0.0, args.seconds
    df = extract_features(df, features, sr=args.sr, mean=True)
    expanded = expand_feature_columns(df, features, "label")
    groups = {
        f: [c for c in expanded.columns if c == f or c.startswith(f + "_")]
        for f in features
    }
    split = int(len(expanded) * 0.8)
    top, full = run_extensive_gridsearch(
        expanded[:split], expanded[split:], feature_groups=groups,
        components=components, out_dir=args.output_dir,
        cache_dir=args.cache_dir,
    )
    if full is not None:
        print(full.head(args.top_k).to_string())
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="audioanalysisdetector_tpu",
        description="TPU-native audio deepfake detection framework",
    )
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("audio", help="WAV directory or glob")
        sp.add_argument("--sr", type=int, default=16000)
        sp.add_argument("--seconds", type=float, default=2.0)
        sp.add_argument("--seed", type=int, default=0)

    def mel_profile_flag(sp):
        sp.add_argument(
            "--mel-profile", choices=("parity", "speech"), default="parity",
            help="'parity' = librosa-default 2048-pt mel (the reference "
            "contract); 'speech' = 32 ms/16 ms speech-standard resolution, "
            "~2.2x faster scoring (use the SAME profile for train + score)",
        )

    sp = sub.add_parser("score", help="log-mel + CNN-BiLSTM spoof scoring")
    common(sp)
    sp.add_argument("--n-mels", type=int, default=64)
    mel_profile_flag(sp)
    sp.add_argument(
        "--batch-size", type=int, default=512,
        help="streaming batch size (fixed shape -> one compile; decode of "
        "batch k+1 overlaps device scoring of batch k)",
    )
    sp.add_argument("--checkpoint", default=None)
    sp.add_argument(
        "--allow-random", action="store_true",
        help="score with randomly initialized weights (smoke tests only)",
    )
    sp.set_defaults(fn=cmd_score)

    sp = sub.add_parser("extract", help="feature extraction to .npz")
    common(sp)
    sp.add_argument("--feature", default="cqcc")
    sp.add_argument("--output", default="features.npz")
    sp.add_argument("--batch-size", type=int, default=512)
    sp.set_defaults(fn=cmd_extract)

    sp = sub.add_parser("augment", help="on-device augmentation demo")
    common(sp)
    sp.add_argument("--output-dir", default="augmented")
    sp.add_argument("--noise-factor", type=float, default=0.005)
    sp.add_argument("--pitch-steps", type=float, default=2.0)
    sp.set_defaults(fn=cmd_augment)

    sp = sub.add_parser("train", help="CNN-BiLSTM training run")
    common(sp)
    sp.add_argument("--n-mels", type=int, default=64)
    mel_profile_flag(sp)
    sp.add_argument("--epochs", type=int, default=5)
    sp.add_argument("--batch-size", type=int, default=16)
    sp.add_argument("--lr", type=float, default=1e-4)
    sp.add_argument("--optimizer", default="Adam")
    sp.add_argument("--run-dir", default="runs/cnn_bilstm")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("xai", help="attribution heatmaps for one WAV")
    common(sp)
    sp.add_argument("--n-mels", type=int, default=64)
    sp.add_argument("--output-dir", default="xai_out")
    sp.add_argument("--methods", default="saliency,gradcam",
                    help="comma list: saliency,gradcam,ig,occlusion,lime")
    sp.add_argument("--ig-steps", type=int, default=20)
    sp.add_argument("--lime-perturbations", type=int, default=30)
    sp.add_argument("--html", action="store_true",
                    help="also write a self-contained explanation.html")
    sp.set_defaults(fn=cmd_xai)

    def _weight_arg(v: str):
        return v if v == "auto" else float(v)

    def fusion_flags(sp):
        sp.add_argument(
            "--map-adapt", choices=("means", "full"), default="means",
            help="MAP adaptation mode: 'means' (Reynolds-style, default) or "
            "'full' (the reference's means+vars+weights update — can "
            "destabilize the LLR; see train/gmm_system.py)",
        )
        sp.add_argument(
            "--fusion-weight", type=_weight_arg, default=0.5,
            help="BiLSTM weight in the fusion: a float (reference: 0.5) or "
            "'auto' to pick it on the train split (EER of the calibrated "
            "blend, ties toward 0.5)",
        )
        sp.add_argument(
            "--calibrate-llr", action="store_true",
            help="Platt-calibrate sigmoid(LLR) on the train split before fusing",
        )
        sp.add_argument(
            "--gmm-deltas", action="store_true",
            help="model CQCC+delta+delta-delta frames in the GMM arm (the "
            "classic ASVspoof CQCC-GMM recipe; the BiLSTM arm is unchanged)",
        )
        sp.add_argument(
            "--gmm-cmvn", action="store_true",
            help="per-utterance cepstral mean/variance normalization of the "
            "GMM arm's frames (cancels convolutional channel offsets; the "
            "BiLSTM arm is unchanged)",
        )

    sp = sub.add_parser("train-fused", help="GMM(+)BiLSTM flagship system")
    common(sp)
    sp.add_argument("--epochs", type=int, default=5)
    sp.add_argument("--batch-size", type=int, default=16)
    sp.add_argument("--lr", type=float, default=1e-4)
    sp.add_argument("--hidden", type=int, default=128)
    sp.add_argument("--gmm-components", type=int, default=16)
    sp.add_argument("--run-dir", default="runs/GMM-BiLSTM")
    fusion_flags(sp)
    sp.set_defaults(fn=cmd_train_fused)

    sp = sub.add_parser(
        "train-asvspoof",
        help="metadata-driven flagship recipe on an ASVspoof-layout corpus",
    )
    sp.add_argument("train_metadata", help="whitespace metadata file (train)")
    sp.add_argument("eval_metadata", help="whitespace metadata file (eval)")
    sp.add_argument("--audio-dir", nargs="+", required=True,
                    help="folder(s) holding the FLAC/WAV files")
    sp.add_argument("--extension", default=".flac")
    sp.add_argument("--sr", type=int, default=16000)
    sp.add_argument("--sample-size", type=int, default=None)
    sp.add_argument("--epochs", type=int, default=50)
    sp.add_argument("--lr", type=float, default=1e-4)
    sp.add_argument("--batch-size", type=int, default=16)
    sp.add_argument("--hidden", type=int, default=128)
    sp.add_argument("--gmm-components", type=int, default=128)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--run-dir", default="GMM-BiLSTM")
    sp.add_argument(
        "--augment", action="store_true",
        help="expand the TRAIN split with the reference's augmentation "
        "policy (p=0.8 one of pitch/noise, p=0.5 a pair; applied on-device "
        "during extraction — reference/ASV_dl_func.py:96-127)",
    )
    fusion_flags(sp)
    sp.set_defaults(fn=cmd_train_asvspoof)

    sp = sub.add_parser(
        "train-3features",
        help="3-feature (cqcc+gtcc+mfcc) shared-trunk fusion net",
    )
    common(sp)
    sp.add_argument("--epochs", type=int, default=50)
    sp.add_argument("--batch-size", type=int, default=16)
    sp.add_argument("--lr", type=float, default=1e-4)
    sp.add_argument("--run-dir", default="runs/MoreFeatures")
    sp.set_defaults(fn=cmd_train_3features)

    sp = sub.add_parser("train-mfca", help="MobileNetV2+MFCA on log-mel")
    common(sp)
    sp.add_argument("--n-mels", type=int, default=64)
    sp.add_argument("--epochs", type=int, default=20)
    sp.add_argument("--batch-size", type=int, default=32)
    sp.add_argument("--lr", type=float, default=1e-4)
    sp.add_argument("--run-dir", default="runs/MobileNet-MFCA")
    sp.set_defaults(fn=cmd_train_mfca)

    sp = sub.add_parser(
        "serve", help="HTTP scoring service with dynamic micro-batching"
    )
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=8710)
    sp.add_argument("--sr", type=int, default=16000)
    sp.add_argument("--seconds", type=float, default=2.0)
    sp.add_argument("--n-mels", type=int, default=64)
    mel_profile_flag(sp)
    sp.add_argument(
        "--max-batch", type=int, default=256,
        help="row budget per device dispatch (largest compiled shape)",
    )
    sp.add_argument(
        "--buckets", default=None,
        help="comma-separated dispatch-size ladder ending at max-batch "
        "(default: powers of two max-batch/8..max-batch); partial batches "
        "pad up to the smallest bucket instead of max-batch",
    )
    sp.add_argument(
        "--data-parallel", choices=("auto", "on", "off"), default="auto",
        help="shard each dispatch batch across local devices (GSPMD data "
        "axis); auto = on when >1 local device",
    )
    sp.add_argument(
        "--max-wait-ms", type=float, default=5.0,
        help="micro-batching window CAP: bursts ship when the row budget "
        "fills; otherwise the adaptive policy ships as soon as the arrival-"
        "rate estimate says the next bucket boundary is out of reach "
        "(--no-adaptive waits the full window instead)",
    )
    sp.add_argument(
        "--no-adaptive", action="store_true",
        help="disable the EWMA arrival-rate window (always wait max-wait-ms "
        "for a partial batch)",
    )
    sp.add_argument("--checkpoint", default=None)
    sp.add_argument(
        "--allow-random", action="store_true",
        help="serve randomly initialized weights (smoke tests only)",
    )
    sp.add_argument(
        "--workers", type=int, default=1,
        help="HTTP worker processes sharing the port via SO_REUSEPORT "
        "(serve/multiproc.py); 1 = single-process in-threads mode. The "
        "device stays owned by ONE process either way — workers forward "
        "rows over a unix socket, so micro-batching aggregates across "
        "all of them",
    )
    sp.set_defaults(fn=cmd_serve)

    sp = sub.add_parser("gridsearch", help="classical SVM/XGB sweep")
    common(sp)
    sp.add_argument("--output-dir", default="gridsearch_results")
    sp.add_argument("--top-k", type=int, default=5)
    sp.add_argument(
        "--features", default="wpt,mfcc,lfcc",
        help="comma list of extractors swept as feature sets; 'formants' "
        "adds the Burg-LPC prosodic dict (reference: 6 features)",
    )
    sp.add_argument(
        "--components", default="10,20,30,40",
        help="comma list of PCA/ICA component counts (the reference's space)",
    )
    sp.add_argument(
        "--cache-dir", default=None,
        help="joblib.Memory dir caching fitted pipeline prefixes across the sweep",
    )
    sp.set_defaults(fn=cmd_gridsearch)

    sp = sub.add_parser(
        "classical",
        help="metadata-driven classical pipeline: 6 features incl. formants "
        "-> expand -> PCA+SVC/XGB grids (reference train_fun.main)",
    )
    sp.add_argument(
        "--dataset", action="append", default=None,
        metavar="KEY:METADATA:AUDIO_DIR",
        help="repeatable; KEY picks the sample cap (LA 5000, others 2500)",
    )
    sp.add_argument(
        "--config", default=None,
        help="reference-style config.yaml with a datasets.{KEY}.{metadata,"
        "flac} block (merged with --dataset specs)",
    )
    sp.add_argument("--sr", type=int, default=16000)
    sp.add_argument("--seconds", type=float, default=4.0,
                    help="fixed analysis window (static shapes; see classical_main)")
    sp.add_argument("--features", default=",".join(
        ("mfcc", "lfcc", "cqcc", "gtcc", "wpt", "formants")))
    sp.add_argument("--components", default="10,20,30,40")
    sp.add_argument("--extension", default=".flac")
    sp.add_argument("--cache-dir", default=None)
    sp.add_argument("--seed", type=int, default=42)
    sp.set_defaults(fn=cmd_classical)

    return p


def main(argv: list[str] | None = None) -> int:
    # cold TPU compiles cost tens of seconds on tunneled runtimes; the
    # persistent cache (keyed by HLO hash) makes repeat CLI invocations warm
    from audioanalysisdetector_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
