"""Per-feature training sweep + the notebook-cell training drivers.

Counterpart of ``train_all_features`` / ``train_feature_model``
(reference/ASV_dl_func.py:872-1029): for every (optimizer, criterion,
feature) cell, standardize that feature on train frames, train a fresh
``AntiSpoofingResNet``, and persist per-cell artifacts — best + final
checkpoints, epoch logs (JSON), final metrics (JSON), and the scaler — in
``{out_dir}/{optimizer}_{criterion}/``.

Also the two notebook-only training loops that previously had no driver
(round-2 review Missing #3): ``train_3features`` (the 3-feature fusion net,
ASV_deep_learning.ipynb cells 32-33) and ``train_mfca`` (MobileNetV2+MFCA,
cells 29-31), each with the same run-dir artifact contract as ``fit``.

Data enters as arrays: ``features[name] = (train_x, test_x)`` with 2-D
feature maps per example, plus integer labels.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

import optax

from audioanalysisdetector_tpu.data.scaler import FrameScaler
from audioanalysisdetector_tpu.models.resnet import AntiSpoofingResNet
from audioanalysisdetector_tpu.train.loop import evaluate, fit
from audioanalysisdetector_tpu.train.state import TrainState


def _sweep_optimizer(name: str, lr: float):
    """The reference sweep's exact hyperparameters
    (reference/ASV_dl_func.py:978-981): SGD at lr=1e-3 momentum 0.9; Adam
    with in-gradient L2 (torch weight_decay=1e-5); AdamW with decoupled
    weight decay 1e-5."""
    if name == "SGD":
        return optax.sgd(1e-3, momentum=0.9)
    if name == "Adam":
        return optax.chain(optax.add_decayed_weights(1e-5), optax.adam(lr))
    if name == "AdamW":
        return optax.adamw(lr, weight_decay=1e-5)
    raise ValueError(f"unknown sweep optimizer {name!r}")


def train_feature_model(
    train_x: np.ndarray,
    train_y: np.ndarray,
    test_x: np.ndarray,
    test_y: np.ndarray,
    *,
    feature_name: str,
    optimizer_name: str = "Adam",
    criterion_name: str = "CrossEntropyLoss",
    lr: float = 1e-4,
    epochs: int = 10,
    batch_size: int = 32,
    out_dir: str = "Res_Net",
    seed: int = 0,
    verbose: bool = False,
) -> dict:
    """One sweep cell: scale -> train -> evaluate -> persist artifacts."""
    cell_dir = os.path.join(out_dir, f"{optimizer_name}_{criterion_name}")
    os.makedirs(cell_dir, exist_ok=True)

    # standardize over all train frames of this feature (reference
    # in-loop scaler, reference/ASV_dl_func.py:963-973)
    scaler = FrameScaler.fit(train_x.reshape(-1, train_x.shape[-1]))
    # host numpy: an eager jnp transform here is one un-jitted device
    # dispatch + full-array fetch per split on tunneled TPU runtimes
    tr = ((np.asarray(train_x) - scaler.mean) / scaler.std).astype(np.float32)
    te = ((np.asarray(test_x) - scaler.mean) / scaler.std).astype(np.float32)
    scaler.save(os.path.join(cell_dir, f"{feature_name}_scaler.npz"))

    model = AntiSpoofingResNet()
    variables = model.init(jax.random.PRNGKey(seed), tr[:1], train=False)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=_sweep_optimizer(optimizer_name, lr),
        batch_stats=variables["batch_stats"],
    )
    run_dir = os.path.join(cell_dir, feature_name)
    result = fit(
        state, (tr, train_y), (te, test_y),
        loss_name=criterion_name, num_epochs=epochs, batch_size=batch_size,
        seed=seed, run_dir=run_dir, has_batch_stats=True, verbose=verbose,
        plots=False,
    )
    metrics_best = evaluate(result.best_state, (te, test_y), loss_name=criterion_name)
    metrics_final = evaluate(result.state, (te, test_y), loss_name=criterion_name)

    with open(os.path.join(cell_dir, f"{feature_name}_logs.json"), "w") as f:
        json.dump([l.__dict__ for l in result.logs], f, indent=2)
    with open(os.path.join(cell_dir, f"{feature_name}_metrics.json"), "w") as f:
        json.dump({"best": metrics_best, "final": metrics_final}, f, indent=2)
    return {
        "feature": feature_name,
        "optimizer": optimizer_name,
        "criterion": criterion_name,
        "best": metrics_best,
        "final": metrics_final,
        "run_dir": run_dir,
    }


def _notebook_driver(
    model, tx, tr, train_y, te, test_y, *,
    epochs: int, batch_size: int, out_dir: str, seed: int, verbose: bool,
) -> dict:
    """Shared body of the notebook-cell drivers: CrossEntropy fit with the
    run-dir artifact contract, best+final eval, metrics.json. ``tr``/``te``
    are an array or an aligned tuple of arrays (multi-input models)."""

    first = (a[:1] for a in tr) if isinstance(tr, tuple) else (tr[:1],)
    variables = model.init(jax.random.PRNGKey(seed), *first, train=False)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables["batch_stats"],
    )
    result = fit(
        state, (tr, train_y), (te, test_y),
        loss_name="CrossEntropyLoss", num_epochs=epochs, batch_size=batch_size,
        seed=seed, run_dir=out_dir, has_batch_stats=True, verbose=verbose,
        plots=False,
    )
    metrics_best = evaluate(result.best_state, (te, test_y), loss_name="CrossEntropyLoss")
    metrics_final = evaluate(result.state, (te, test_y), loss_name="CrossEntropyLoss")
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump({"best": metrics_best, "final": metrics_final}, f, indent=2)
    return {"best": metrics_best, "final": metrics_final, "run_dir": out_dir}


def train_3features(
    train_feats: tuple[np.ndarray, np.ndarray, np.ndarray],
    train_y: np.ndarray,
    test_feats: tuple[np.ndarray, np.ndarray, np.ndarray],
    test_y: np.ndarray,
    *,
    epochs: int = 50,
    lr: float = 1e-4,
    batch_size: int = 16,
    out_dir: str = "MoreFeatures",
    seed: int = 0,
    verbose: bool = False,
) -> dict:
    """Train the shared-trunk 3-feature fusion net end to end — the
    notebook's ``train_loop_3features`` driver (ASV_deep_learning.ipynb
    cells 32-33: (cqcc, gtcc, mfcc) UNSCALED through one shared
    ``ExtractFeatureResidual``, CrossEntropy, Adam lr 1e-4, batch 16,
    best-state tracking by val loss, final acc/F1/EER).

    ``train_feats`` / ``test_feats``: three aligned (N, H_i, W_i) arrays.
    Returns {"best": metrics, "final": metrics, "run_dir": ...}.
    """

    from audioanalysisdetector_tpu.models.resnet import MoreFeaturesClassifier

    return _notebook_driver(
        MoreFeaturesClassifier(), optax.adam(lr),
        tuple(np.asarray(a, np.float32) for a in train_feats), train_y,
        tuple(np.asarray(a, np.float32) for a in test_feats), test_y,
        epochs=epochs, batch_size=batch_size, out_dir=out_dir, seed=seed,
        verbose=verbose,
    )


def train_mfca(
    train_x: np.ndarray,
    train_y: np.ndarray,
    test_x: np.ndarray,
    test_y: np.ndarray,
    *,
    epochs: int = 20,
    lr: float = 1e-4,
    weight_decay: float = 1e-5,
    batch_size: int = 32,
    out_dir: str = "MobileNet-MFCA",
    seed: int = 0,
    verbose: bool = False,
) -> dict:
    """Train MobileNetV2+MFCA on mel-spectrograms — the notebook's
    ``train_loop_mfca`` driver (ASV_deep_learning.ipynb cells 29-31:
    'mel-spect' unscaled, CrossEntropy, Adam lr 1e-4 weight_decay 1e-5,
    batch 32, epochs 20, best-state tracking by val loss)."""

    from audioanalysisdetector_tpu.models.mobilenet_mfca import MobileNetMFCA

    return _notebook_driver(
        MobileNetMFCA(),
        # torch Adam weight_decay = L2 added to the gradient (not decoupled)
        optax.chain(optax.add_decayed_weights(weight_decay), optax.adam(lr)),
        np.asarray(train_x, np.float32), train_y,
        np.asarray(test_x, np.float32), test_y,
        epochs=epochs, batch_size=batch_size, out_dir=out_dir, seed=seed,
        verbose=verbose,
    )


def train_all_features(
    features: dict[str, tuple[np.ndarray, np.ndarray]],
    train_y: np.ndarray,
    test_y: np.ndarray,
    *,
    optimizers: tuple[str, ...] = ("Adam", "AdamW", "SGD"),
    criteria: tuple[str, ...] = ("CrossEntropyLoss", "MSELoss", "L1Loss"),
    epochs: int = 10,
    lr: float = 1e-4,
    batch_size: int = 32,
    out_dir: str = "Res_Net",
    seed: int = 0,
) -> list[dict]:
    """The full nested sweep (reference defaults: {Adam, AdamW, SGD} x
    {CrossEntropy, MSE, L1} x features, reference/ASV_dl_func.py:945-953)."""
    results = []
    for opt in optimizers:
        for crit in criteria:
            for feat_name, (tr_x, te_x) in features.items():
                results.append(
                    train_feature_model(
                        tr_x, train_y, te_x, test_y,
                        feature_name=feat_name, optimizer_name=opt,
                        criterion_name=crit, lr=lr, epochs=epochs,
                        batch_size=batch_size, out_dir=out_dir, seed=seed,
                    )
                )
    with open(os.path.join(out_dir, "sweep_summary.json"), "w") as f:
        json.dump(results, f, indent=2, default=float)
    return results
