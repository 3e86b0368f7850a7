#!/usr/bin/env python
"""Write QUALITY_r{N}.json — the per-round EER quality artifact.

Four lanes, all through the public ``train-asvspoof`` CLI on deterministic
synthetic corpora (CPU-pinned so the artifact is hardware-independent):

- ``v4_lane``: the frozen recipe-v4 seed-(0,1) run — round-over-round trend
  continuity with QUALITY_r02..r04.
- ``multiseed_v4``: recipe v4 over 5 disjoint (train, eval) seed pairs —
  per-seed fused/BiLSTM/GMM EER, per-arm mean±std, fused win rate. The
  round-4 verdict's top item: the one-EER-step fused win must not be an
  artifact of seed pair (0,1).
- ``v5`` (headline): recipe v5 on the channel-varied corpus
  (train.quality.RECIPE_V5) with a 4x larger eval set (EER step 1/960) —
  the new trend line now that both arms saturated the clean v4 corpus.
- ``multiseed_v5``: the same 5-seed-pair robustness lane for v5.

The file is (re)written after each lane completes, so a crash preserves
finished lanes. Usage: ``python benchmarks/quality_eval.py [round_number]``.

Reference anchor (real ASVspoof LA, ASV_deep_learning.ipynb cell 25):
fused accuracy 0.8195, F1 0.8379, EER 0.2565 — the surrogate numbers are a
trend line, not that benchmark, until real LA data is mounted (then the
same CLI command validates directly).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    # quality numbers are a ROUND-OVER-ROUND trend line: pin the backend to
    # CPU so the artifact is hardware-independent and bit-reproducible
    import jax

    jax.config.update("jax_platforms", "cpu")

    from audioanalysisdetector_tpu.train.quality import (
        RECIPE,
        RECIPE_V5,
        run_multiseed_quality,
        run_surrogate_quality,
    )

    round_no = sys.argv[1] if len(sys.argv) > 1 else "current"
    if round_no == "current":
        name = "QUALITY.json"
    else:
        name = f"QUALITY_r{int(round_no):02d}.json"  # zero-padded like QUALITY_r02
    path = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", name))

    out: dict = {
        "metric": "surrogate_fused_eer_v5",
        "unit": "eer",
        "recipe_versions": {"headline": 5, "continuity": 4},
    }

    def flush() -> None:
        with open(path, "w") as f:
            json.dump(out, f, indent=2)

    def lane(key: str, fn) -> None:
        t0 = time.time()
        with tempfile.TemporaryDirectory(prefix=f"quality_{key}_") as workdir:
            out[key] = fn(workdir)
        out[key]["lane_wall_s"] = round(time.time() - t0, 1)
        flush()
        print(f"lane {key} done in {out[key]['lane_wall_s']}s", file=sys.stderr)

    # headline first so a partial artifact still carries the round's number
    lane("v5", lambda d: run_surrogate_quality(d, recipe=RECIPE_V5))
    out["value"] = out["v5"]["fused"]["eer"]
    # the v5 corpus carries LA-like channel variation, so the comparison to
    # the reference's real-LA EER is closer in kind than v4's clean corpus
    # was — still a surrogate, not that benchmark
    out["vs_baseline"] = round(out["value"] - 0.2565, 4)
    flush()

    lane("v4_lane", lambda d: run_surrogate_quality(d, recipe=RECIPE))
    # pair (0, 1) is the trend lane above — reuse instead of retraining
    lane(
        "multiseed_v4",
        lambda d: run_multiseed_quality(
            d, recipe=RECIPE, precomputed={(0, 1): out["v4_lane"]}
        ),
    )
    lane(
        "multiseed_v5",
        lambda d: run_multiseed_quality(
            d, recipe=RECIPE_V5, precomputed={(0, 1): out["v5"]}
        ),
    )

    print(json.dumps({k: out[k] for k in ("metric", "value", "unit", "vs_baseline")}))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
