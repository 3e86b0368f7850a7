"""Flagship recipe end-to-end — ASV_deep_learning.ipynb cells 22-25.

Surrogate corpus -> 2-s chunks -> CQCC (on-device, time-major) -> BiLSTM
pipeline (run-dir with best/worst checkpoints, CSV/JSON logs, plots) ->
GMM-UBM + MAP adaptation -> fused GMM⊕BiLSTM evaluation.

The same flow on a real ASVspoof-LA tree is the `train-asvspoof` CLI
command; `train-fused` is the directory-labeled variant.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo-root run, no install needed

import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from audioanalysisdetector_tpu.data import (
    balance_upsample,
    extract_features,
    prepare_dataframe,
)
from audioanalysisdetector_tpu.data.scaler import prepare_train_test_data
from audioanalysisdetector_tpu.data.shape_utils import prepare_data_gmm_bilstm
from audioanalysisdetector_tpu.data.synthetic import make_surrogate_corpus
from audioanalysisdetector_tpu.score import eval_fused, make_fused_scorer
from audioanalysisdetector_tpu.train.gmm_system import train_gmm_system
from audioanalysisdetector_tpu.train.loop import bilstm_pipeline

SR = 16000


def build_split(root: str, subset: str, seed: int) -> tuple[np.ndarray, np.ndarray]:
    # a half-size cut of the frozen quality recipe (train/quality.py) —
    # 4.5-s files give two 2-s chunks each, ~180 train chunks
    meta, flac_dir = make_surrogate_corpus(
        root, n_bonafide=45, n_spoof_per_tier=15, seconds=4.5,
        subset=subset, seed=seed,
    )
    df = prepare_dataframe(
        {"LA": {"metadata": meta, "flac": [flac_dir]}},
        balance=False,
        extension=".flac",
        rescue_dir=None,
    )
    df = extract_features(df, ["cqcc"], sr=SR)     # batched on device
    df = prepare_data_gmm_bilstm(df)               # filtr_nan + (19,63)->(63,19)
    df["label_num"] = (df["label"].astype(str).str.lower() == "spoof").astype(int)
    if subset == "train":
        df = balance_upsample(df, seed=seed)
    x = np.stack([np.asarray(c, np.float32) for c in df["cqcc"]])
    return x, df["label_num"].to_numpy()


def main() -> None:
    root = tempfile.mkdtemp(prefix="aad_flagship_")
    run_dir = os.path.join(root, "run")
    x_tr, y_tr = build_split(root, "train", seed=0)
    x_te, y_te = build_split(root, "eval", seed=1)
    print(f"train {x_tr.shape}, eval {x_te.shape}")

    # per-frame standardization, scaler persisted next to the checkpoints
    os.makedirs(run_dir, exist_ok=True)
    tr, te, _scaler = prepare_train_test_data(
        x_tr, x_te, scaler_path=os.path.join(run_dir, "scaler.npz")
    )

    # the reference trains 50 epochs at lr 1e-4 on ~28k chunks; this demo
    # corpus is ~100x smaller, so fewer-but-hotter steps reach a useful model
    result, bilstm_metrics = bilstm_pipeline(
        (tr, y_tr), (te, y_te), num_epochs=30, lr=3e-4, hidden=64,
        batch_size=16, model_dir=run_dir,
    )
    print("bilstm:", bilstm_metrics)

    # GMM-UBM on all train frames + MAP-adapted class models (means-only
    # Reynolds adaptation is the system default; --map-adapt full is the
    # reference-parity mode — see docs/QUALITY.md)
    _, g_gen, g_spoof = train_gmm_system(
        tr, y_tr, n_components=32, model_dir=run_dir
    )

    scorer = make_fused_scorer(
        result.best_state.apply_fn, {"params": result.best_state.params},
        g_gen, g_spoof,
    )
    _, _, fused_metrics = eval_fused(scorer, te, y_te, batch_size=64)
    print("fused:", fused_metrics)
    print("artifacts in", run_dir)


if __name__ == "__main__":
    main()
