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
):
    """Metadata + audio folders -> (x (N, T, 19) float32, y (N,) int) via the
    flagship CQCC path (ASV_deep_learning.ipynb cells 22-24): 2-s chunking,
    batched CQCC extraction, NaN filtering, time-major transpose, optional
    train-split upsampling. Shared by ``cli train-asvspoof`` and the fusion
    diagnostics in ``benchmarks/fusion_lab.py`` — one recipe, no drift."""
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
    df = extract_features(df, ["cqcc"], sr=sr)
    df = prepare_data_gmm_bilstm(df)  # filtr_nan + time-major transpose
    df["label_num"] = (df["label"].astype(str).str.lower() == "spoof").astype(int)
    if balance:
        df = balance_upsample(df, seed=seed)
    x = np.stack([np.asarray(c, np.float32) for c in df["cqcc"]])
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
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(argv)
    if rc != 0:
        raise RuntimeError(f"train-asvspoof failed rc={rc}:\n{buf.getvalue()}")
    metrics = json.loads(buf.getvalue().strip().splitlines()[-1])
    metrics["recipe"] = r
    return metrics
