#!/usr/bin/env python
"""GMM-arm diagnosis sweep on the surrogate corpus.

Round 3 left the GMM arm weak (LLR-rank EER 0.204 alone vs BiLSTM 0.058)
and fusion one EER step behind the BiLSTM arm. This lab answers, with
measurements, whether the arm or the surrogate is the limiter: it trains
the flagship BiLSTM ONCE on the frozen quality recipe's corpus, then
sweeps the GMM arm over components x {static, +delta+deltadelta} frames,
reporting for each config the GMM-alone rank EER and the fused EER under
three fusion policies — the reference's literal 0.5/0.5 sigmoid(LLR)
blend (reference/ASV_dl_func.py:1448-1462), Platt-calibrated, and
calibrated + train-split auto weight.

Usage: ``python benchmarks/fusion_lab.py [out.json] [--recipe N]``
(CPU-pinned, like ``quality_eval.py`` — the numbers feed the recipe
choice, so they must be hardware-independent). ``--recipe 5`` sweeps on
the v5 channel-varied corpus (round-5 verdict #3).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from audioanalysisdetector_tpu.cli.main import _eval_fused_system
    from audioanalysisdetector_tpu.data.scaler import prepare_train_test_data
    from audioanalysisdetector_tpu.data.synthetic import make_surrogate_corpus
    from audioanalysisdetector_tpu.train.gmm_system import train_gmm_system
    from audioanalysisdetector_tpu.train.loop import bilstm_pipeline
    from audioanalysisdetector_tpu.train.quality import RECIPES, build_cqcc_arrays

    args = [a for a in sys.argv[1:]]
    version = 4
    if "--recipe" in args:
        i = args.index("--recipe")
        version = int(args[i + 1])
        del args[i : i + 2]
    r = RECIPES[version]
    with tempfile.TemporaryDirectory(prefix="fusion_lab_") as workdir:
        tr_meta, tr_dir = make_surrogate_corpus(
            os.path.join(workdir, "train"), subset="train", **r["train"]
        )
        ev_meta, ev_dir = make_surrogate_corpus(
            os.path.join(workdir, "eval"), subset="eval", **r["eval"]
        )
        dirs = [tr_dir, ev_dir]
        x_tr, y_tr = build_cqcc_arrays(
            tr_meta, dirs, name="train", rescue_dir=workdir,
            seed=r["train"]["seed"], balance=True,
        )
        x_te, y_te = build_cqcc_arrays(ev_meta, dirs, name="eval", rescue_dir=workdir)
        tr, te, _ = prepare_train_test_data(
            x_tr, x_te, scaler_path=os.path.join(workdir, "scaler.npz")
        )
        t0 = time.time()
        result, bilstm_metrics = bilstm_pipeline(
            (tr, y_tr), (te, y_te), num_epochs=r["epochs"], lr=r["lr"],
            batch_size=r["batch_size"], hidden=r["hidden"],
            model_dir=os.path.join(workdir, "run"), seed=r["train"]["seed"],
        )
        print(
            f"# bilstm ({time.time() - t0:.0f}s): {json.dumps(bilstm_metrics)}",
            flush=True,
        )

        rows = []
        for ncomp in (32, 64, 128):
            # cmvn axis added round 5: per-utterance cepstral mean/variance
            # normalization of the GMM frames — the textbook counter to the
            # v5 corpus's convolutional channel variation (reverb/bitcrush
            # are cepstral offsets CMVN cancels; see gmm_system.sequence_cmvn)
            for deltas, cmvn in (
                (False, False), (True, False), (False, True), (True, True),
            ):
                t0 = time.time()
                _, g_gen, g_spoof = train_gmm_system(
                    tr, y_tr, n_components=ncomp, deltas=deltas, cmvn=cmvn,
                    model_dir=os.path.join(
                        workdir, f"gmm_{ncomp}_{int(deltas)}{int(cmvn)}"
                    ),
                )
                t_gmm = time.time() - t0
                for mode, weight, calibrate in (
                    ("literal", 0.5, False),
                    ("calibrated", 0.5, True),
                    ("cal+autow", "auto", True),
                ):
                    gm, fm, cal = _eval_fused_system(
                        result.best_state, g_gen, g_spoof, tr, y_tr, te, y_te,
                        batch_size=r["batch_size"], weight=weight,
                        calibrate=calibrate, gmm_deltas=deltas, gmm_cmvn=cmvn,
                    )
                    fm.pop("_eval_scores", None)
                    rows.append({
                        "ncomp": ncomp, "deltas": deltas, "cmvn": cmvn,
                        "mode": mode,
                        "gmm_eer": gm["eer"], "fused": fm,
                        "scale": round(cal[0], 4), "bias": round(cal[1], 4),
                        "weight": cal[2], "gmm_train_s": round(t_gmm, 1),
                    })
                    print(json.dumps(rows[-1]), flush=True)

    out = {"bilstm": bilstm_metrics, "recipe": r, "sweep": rows}
    path = args[0] if args else None
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
