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
RECIPE = dict(
    version=3,
    train=dict(n_bonafide=90, n_spoof_per_tier=30, seconds=4.5, seed=0),
    eval=dict(n_bonafide=120, n_spoof_per_tier=40, seconds=4.5, seed=1),
    epochs=60, hidden=64, gmm_components=32, batch_size=16, lr=3e-4,
)


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
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main([
            "train-asvspoof", tr_meta, ev_meta, "--audio-dir", tr_dir, ev_dir,
            "--epochs", str(r["epochs"]), "--hidden", str(r["hidden"]),
            "--gmm-components", str(r["gmm_components"]),
            "--batch-size", str(r["batch_size"]), "--lr", str(r["lr"]),
            "--run-dir", os.path.join(workdir, "run"),
        ])
    if rc != 0:
        raise RuntimeError(f"train-asvspoof failed rc={rc}:\n{buf.getvalue()}")
    metrics = json.loads(buf.getvalue().strip().splitlines()[-1])
    metrics["recipe"] = r
    return metrics
