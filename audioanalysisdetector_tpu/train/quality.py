"""EER-tracking surrogate evaluation — the in-env quality trend line.

The quality north star (ASVspoof-LA EER within 0.1% of the reference's
0.2565, BASELINE.md) cannot be validated in this image (no ASVspoof audio),
so rounds are compared on a DETERMINISTIC synthetic surrogate instead: the
``data.synthetic`` corpus (speech-like bonafide vs three vocoder-artifact
spoof tiers) run through the reference's full flagship recipe via the
public ``train-asvspoof`` CLI — metadata ingestion, in-repo FLAC decode,
2-s chunking, CQCC, balancing, scaling, BiLSTM training, GMM-UBM + MAP,
fused scoring (ASV_deep_learning.ipynb cells 22-25).

``benchmarks/quality_eval.py`` writes the per-round QUALITY_rNN.json from
this; the slow test asserts the recipe keeps learning the task.
"""

from __future__ import annotations

import io
import json
import os
from contextlib import redirect_stdout

# frozen recipe — change ONLY with a version bump, or round-over-round
# numbers stop being comparable.
# v2: eval set enlarged 30 -> 120 files (training unchanged) — v1's 15
# bonafide eval files quantized EER to steps of 1/15, so a single
# borderline utterance flipping dominated the round-over-round signal
# v3: train 78 -> 180 files, eval 120 -> 240 files — at v2's size both
# arms landed at EER 0.25-0.29 with seed jitter of the same magnitude, so
# fusion deltas were inside the noise floor (docs/QUALITY.md). At v3's
# size both arms strengthen (BiLSTM ~0.08-0.10, GMM ~0.20 measured over
# two seeds) and fused <= BiLSTM holds on both.
# v4 (corpus/training UNCHANGED from v3 — BiLSTM numbers stay comparable):
# fusion policy upgraded from the literal 0.5/0.5 sigmoid(LLR) blend to
# calibrated (Platt on train) + train-split auto weight, and the GMM arm
# to 64 components on CQCC+Δ+ΔΔ frames. Chosen from the measured
# benchmarks/fusion_lab.py sweep (18 configs, docs/QUALITY.md): v3's
# recipe left fused EER 0.0625 vs BiLSTM-alone 0.0583; v4's lands 0.0542
# — strictly below the BiLSTM arm with accuracy/F1 still ahead. The
# reference's literal 0.5/0.5 contract remains the CLI default
# (reference/ASV_dl_func.py:1448-1462); the recipe opts into the flags.
RECIPE = dict(
    version=4,
    train=dict(n_bonafide=90, n_spoof_per_tier=30, seconds=4.5, seed=0),
    eval=dict(n_bonafide=120, n_spoof_per_tier=40, seconds=4.5, seed=1),
    epochs=60, hidden=64, gmm_components=64, batch_size=16, lr=3e-4,
    gmm_deltas=True, calibrate_llr=True, fusion_weight="auto",
)

# v5 (round 5): the v4 corpus saturated — both arms at ~0.05 EER, spoof
# tiers nearly solved, no headroom left to show quality work (round-4
# verdict Weak #2). v5 adds label-independent CHANNEL variation (every
# utterance, both classes, same distribution: optional reverb FIR, additive
# noise at SNR~U(6,24) dB, optional low-bit-depth codec round-trip — see
# data.synthetic.apply_channel) and quadruples the eval set so the EER
# step drops 1/240 -> 1/960. The GMM config below is the winner of the
# 36-config fusion_lab sweep ON THIS corpus (FUSION_LAB_v5.json): 128
# components, NO deltas, per-utterance CMVN of the GMM frames, the
# reference's literal 0.5/0.5 sigmoid(LLR) blend
# (reference/ASV_dl_func.py:1448-1462). Under channel variation the
# Δ/ΔΔ frames and Platt calibration that won on the clean v4 corpus both
# LOSE (deltas amplify channel noise; the calibrator overfits the train
# channel draw), while CMVN — the textbook counter to convolutional
# channel offsets (gmm_system.sequence_cmvn) — cuts the arm's solo rank
# EER 0.2719 -> 0.2427 and the fused EER 0.2302 -> 0.2240 (BiLSTM arm
# 0.2354; literal blend best in every cell). The v4 recipe stays
# runnable for trend continuity (quality_eval records both lanes).
RECIPE_V5 = dict(
    version=5,
    train=dict(
        n_bonafide=180, n_spoof_per_tier=60, seconds=4.5, seed=0,
        channel="varied",
    ),
    eval=dict(
        n_bonafide=480, n_spoof_per_tier=160, seconds=4.5, seed=1,
        channel="varied",
    ),
    epochs=40, hidden=64, gmm_components=128, batch_size=16, lr=3e-4,
    gmm_deltas=False, gmm_cmvn=True, calibrate_llr=False, fusion_weight=0.5,
)

RECIPES = {4: RECIPE, 5: RECIPE_V5}

# disjoint (train, eval) seed pairs for the robustness lane — (0, 1) is
# also the frozen per-round trend lane, kept first for continuity
SEED_PAIRS = ((0, 1), (2, 3), (4, 5), (6, 7), (8, 9))


def build_cqcc_arrays(
    metadata: str,
    audio_dirs,
    *,
    name: str,
    sr: int = 16000,
    sample_size: int | None = None,
    extension: str = ".flac",
    rescue_dir: str | None = None,
    seed: int = 0,
    balance: bool = False,
    return_attack: bool = False,
    augment: bool = False,
):
    """Metadata + audio folders -> (x (N, T, 19) float32, y (N,) int) via the
    flagship CQCC path (ASV_deep_learning.ipynb cells 22-24): 2-s chunking,
    batched CQCC extraction, NaN filtering, time-major transpose, optional
    train-split upsampling. Shared by ``cli train-asvspoof`` and the fusion
    diagnostics in ``benchmarks/fusion_lab.py`` — one recipe, no drift.

    ``return_attack=True`` appends the per-chunk attack-system ids
    (metadata ``attack_id`` column, '-'/'bonafide' for genuine speech) so
    callers can report per-tier EER (each spoof system vs all bonafide —
    how the ASVspoof challenge itself decomposes the pooled number).

    ``augment=True`` applies the reference's row-expansion policy
    (reference/ASV_dl_func.py:96-127: p=0.8 one augmentation, p=0.5 a
    pair — pitch/noise, applied on-device during extraction) to the split
    before feature extraction; train-split only."""
    import numpy as np

    from audioanalysisdetector_tpu.data import (
        balance_upsample,
        extract_features,
        prepare_dataframe,
    )
    from audioanalysisdetector_tpu.data.shape_utils import prepare_data_gmm_bilstm

    all_data = {name: {"metadata": metadata, "flac": list(audio_dirs)}}
    df = prepare_dataframe(
        all_data, balance=False, sample_size=sample_size,
        extension=extension, rescue_dir=rescue_dir,
    )
    if df.empty:
        raise SystemExit(f"no usable utterances from {metadata}")
    if augment:
        from audioanalysisdetector_tpu.data.balance import add_data_augmentation

        df = add_data_augmentation(df, seed=seed)
    df = extract_features(df, ["cqcc"], sr=sr, seed=seed)
    df = prepare_data_gmm_bilstm(df)  # filtr_nan + time-major transpose
    df["label_num"] = (df["label"].astype(str).str.lower() == "spoof").astype(int)
    if balance:
        df = balance_upsample(df, seed=seed)
    x = np.stack([np.asarray(c, np.float32) for c in df["cqcc"]])
    if return_attack:
        attack = (
            df["attack_id"].astype(str).to_numpy()
            if "attack_id" in df.columns
            else np.full(len(df), "-", dtype=object)
        )
        return x, df["label_num"].to_numpy(), attack
    return x, df["label_num"].to_numpy()


def run_surrogate_quality(workdir: str, *, recipe: dict | None = None) -> dict:
    """Generate the surrogate corpus and run the flagship recipe end to end.

    Returns {"bilstm": {...}, "fused": {...}, "recipe": {...}} with
    accuracy/f1/eer per scorer.
    """
    from audioanalysisdetector_tpu.cli.main import main
    from audioanalysisdetector_tpu.data.synthetic import make_surrogate_corpus

    r = recipe or RECIPE
    tr_meta, tr_dir = make_surrogate_corpus(
        os.path.join(workdir, "train"), subset="train", **r["train"]
    )
    ev_meta, ev_dir = make_surrogate_corpus(
        os.path.join(workdir, "eval"), subset="eval", **r["eval"]
    )
    argv = [
        "train-asvspoof", tr_meta, ev_meta, "--audio-dir", tr_dir, ev_dir,
        "--epochs", str(r["epochs"]), "--hidden", str(r["hidden"]),
        "--gmm-components", str(r["gmm_components"]),
        "--batch-size", str(r["batch_size"]), "--lr", str(r["lr"]),
        "--run-dir", os.path.join(workdir, "run"),
    ]
    if r.get("fusion_weight") is not None:
        argv += ["--fusion-weight", str(r["fusion_weight"])]
    if r.get("calibrate_llr"):
        argv.append("--calibrate-llr")
    if r.get("gmm_deltas"):
        argv.append("--gmm-deltas")
    if r.get("gmm_cmvn"):
        argv.append("--gmm-cmvn")
    if r.get("augment"):
        argv.append("--augment")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(argv)
    if rc != 0:
        raise RuntimeError(f"train-asvspoof failed rc={rc}:\n{buf.getvalue()}")
    metrics = json.loads(buf.getvalue().strip().splitlines()[-1])
    metrics["recipe"] = r
    return metrics


def run_multiseed_quality(
    workdir: str,
    *,
    recipe: dict | None = None,
    seed_pairs: tuple[tuple[int, int], ...] = SEED_PAIRS,
    precomputed: dict | None = None,
) -> dict:
    """Robustness lane (round-4 verdict #1): the frozen recipe over several
    DISJOINT (train, eval) seed pairs, so a one-EER-step fused win cannot be
    an artifact of one seed pair. Returns per-seed fused/BiLSTM/GMM EER plus
    mean/std per arm and the fused-beats-BiLSTM win rate (ties count as
    wins: fusion's bar is "never worse than its best arm").

    ``precomputed`` maps a ``(train_seed, eval_seed)`` pair to an existing
    ``run_surrogate_quality`` result — the per-round trend lane already
    computes pair (0, 1), no point training it twice."""
    import numpy as np

    r = dict(recipe or RECIPE)
    per_seed = []
    for tr_seed, ev_seed in seed_pairs:
        if precomputed and (tr_seed, ev_seed) in precomputed:
            m = precomputed[(tr_seed, ev_seed)]
        else:
            ri = {**r, "train": {**r["train"], "seed": tr_seed},
                  "eval": {**r["eval"], "seed": ev_seed}}
            m = run_surrogate_quality(
                os.path.join(workdir, f"s{tr_seed}_{ev_seed}"), recipe=ri
            )
        per_seed.append({
            "seeds": [tr_seed, ev_seed],
            "bilstm_eer": m["bilstm"]["eer"],
            "gmm_eer": m["gmm"]["eer"],
            "fused_eer": m["fused"]["eer"],
            "fused_accuracy": m["fused"]["accuracy"],
            "bilstm_accuracy": m["bilstm"]["accuracy"],
            "fusion_weight": m["fused"].get("fusion_weight"),
            "per_tier_eer": m["fused"].get("per_tier_eer"),
        })
    agg = {}
    for arm in ("bilstm", "gmm", "fused"):
        vals = np.array([s[f"{arm}_eer"] for s in per_seed])
        agg[arm] = {"mean_eer": float(vals.mean()), "std_eer": float(vals.std())}
    wins = sum(s["fused_eer"] <= s["bilstm_eer"] + 1e-12 for s in per_seed)
    return {
        "recipe_version": r["version"],
        "n_seed_pairs": len(per_seed),
        "per_seed": per_seed,
        "aggregate": agg,
        "fused_win_rate": wins / len(per_seed),
    }
