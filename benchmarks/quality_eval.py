#!/usr/bin/env python
"""Write QUALITY_r{N}.json — the per-round EER trend artifact.

Runs the frozen surrogate quality recipe (train.quality.RECIPE) through the
public ``train-asvspoof`` CLI on a deterministic synthetic corpus and
records fused/BiLSTM accuracy, F1 and EER so rounds are directly
comparable. Usage: ``python benchmarks/quality_eval.py [round_number]``.

Reference anchors (real ASVspoof LA, ASV_deep_learning.ipynb cell 25):
fused accuracy 0.8195, F1 0.8379, EER 0.2565 — the surrogate numbers are a
trend line, not that benchmark, until real LA data is mounted (then the
same CLI command validates directly).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    # quality numbers are a ROUND-OVER-ROUND trend line: pin the backend to
    # CPU so the artifact is hardware-independent and bit-reproducible
    import jax

    jax.config.update("jax_platforms", "cpu")

    from audioanalysisdetector_tpu.train.quality import run_surrogate_quality

    round_no = sys.argv[1] if len(sys.argv) > 1 else "current"
    with tempfile.TemporaryDirectory(prefix="quality_") as workdir:
        metrics = run_surrogate_quality(workdir)
    out = {
        "metric": "surrogate_fused_eer",
        "value": metrics["fused"]["eer"],
        "unit": "eer",
        "vs_baseline": round(metrics["fused"]["eer"] - 0.2565, 4),
        **metrics,
    }
    if round_no == "current":
        name = "QUALITY.json"
    else:
        name = f"QUALITY_r{int(round_no):02d}.json"  # zero-padded like QUALITY_r02
    path = os.path.join(os.path.dirname(__file__), "..", name)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in ("metric", "value", "unit", "vs_baseline")}))
    print(f"wrote {os.path.abspath(path)}", file=sys.stderr)


if __name__ == "__main__":
    main()
