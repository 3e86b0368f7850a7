"""Training loops: the generic epoch driver and the BiLSTM flagship pipeline.

TPU-native counterparts of ``train_loop`` (reference/ASV_dl_func.py:751-829)
and ``BiLSTM_model`` (reference/ASV_dl_func.py:1230-1424): per-epoch
train/val passes over jitted steps, best/worst checkpoint tracking by val
loss, txt+CSV+JSON logging and loss/accuracy plots per run directory, final
accuracy/F1/EER on the best state.

Data enters as numpy arrays; batches stream host->device. Shapes: training
pads the tail batch with repeated rows (one compiled step) and weights the
metric averages by true counts; evaluation leaves the tail unpadded (at most
one extra compile) so val loss — which drives best-checkpoint selection —
is exact.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable, Iterator

import jax
import numpy as np

from audioanalysisdetector_tpu.train import metrics as M
from audioanalysisdetector_tpu.train.checkpoint import save_checkpoint
from audioanalysisdetector_tpu.train.losses import get_loss, get_loss_per_row
from audioanalysisdetector_tpu.train.optimizers import make_optimizer
from audioanalysisdetector_tpu.train.state import TrainState
from audioanalysisdetector_tpu.train.steps import make_eval_step, make_train_step


def _take(x, sel):
    """Row-select that also handles multi-input tuples (e.g. the 3-feature
    fusion net's (cqcc, gtcc, mfcc) inputs)."""
    if isinstance(x, tuple):
        return tuple(xi[sel] for xi in x)
    return x[sel]


def batch_iter(
    x: np.ndarray | tuple[np.ndarray, ...],
    y: np.ndarray,
    batch_size: int,
    *,
    shuffle: bool,
    seed: int = 0,
    pad_tail: bool = True,
    across_processes: bool = False,
) -> Iterator[tuple[np.ndarray, np.ndarray, int]]:
    """Yield (x_batch, y_batch, true_count); tail batch padded to full size.

    ``x`` may be a tuple of arrays (multi-input models); rows stay aligned.

    ``across_processes``: multi-host data loading — every process walks the
    SAME global permutation (same seed) but materializes only its
    ``parallel.mesh.process_shard`` slice of each global batch; the caller
    assembles the global array (``jax.make_array_from_process_local_data``).
    ``true_count`` stays global.
    """
    n = len(y)
    idx = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    for start in range(0, n, batch_size):
        sel = idx[start : start + batch_size]
        true = len(sel)
        if true < batch_size and pad_tail:
            # np.resize tiles idx cyclically, so the padded batch reaches the
            # FULL batch_size even when the whole dataset is smaller than one
            # batch (a short padded batch would break shard_map divisibility
            # under data parallelism and add a second compiled shape)
            sel = np.concatenate([sel, np.resize(idx, batch_size - true)])
        if across_processes:
            from audioanalysisdetector_tpu.parallel.mesh import process_shard

            sel = sel[process_shard(len(sel))]
        yield _take(x, sel), y[sel], true


@dataclass
class EpochLog:
    epoch: int
    train_loss: float
    train_acc: float
    val_loss: float
    val_acc: float
    seconds: float


@dataclass
class FitResult:
    state: TrainState
    best_state: TrainState
    logs: list[EpochLog] = field(default_factory=list)
    best_epoch: int = -1
    n_compiled_shapes: int = -1  # fit_bucketed: distinct jit cache entries


def _pick_dp_mesh(
    batch_size: int, data_parallel: bool | None, has_batch_stats: bool = False
):
    """Resolve the data-parallel decision for ``fit``.

    ``None`` (auto): use every local device when there is more than one,
    the batch divides evenly AND each shard gets >= 4 rows (sharding 1-2
    rows per device costs more in dispatch/collective overhead than the
    parallelism buys) — single-device behavior is untouched otherwise.
    ``True``: required; raises if the batch cannot be sharded. ``False``:
    off. Returns a ``Mesh`` or None.

    Auto mode additionally requires ``has_batch_stats=False``: a BatchNorm
    model built WITHOUT ``bn_axis_name`` normalizes each shard by its own
    batch statistics under shard_map, which silently changes training
    numerics vs the single-device run — auto must never do that. BN models
    opt in explicitly with ``data_parallel=True`` (per-shard BN forward,
    pmean'd running stats — the standard DP approximation) or, for exact
    parity, a model constructed with ``bn_axis_name`` matching the mesh
    axis (sync-BN; ``cli train`` does this).
    """
    if data_parallel is False:
        return None
    if data_parallel is None and has_batch_stats:
        return None
    n_dev = jax.local_device_count()
    if n_dev <= 1:
        if data_parallel is True:
            raise ValueError("data_parallel=True but only one local device")
        return None
    if batch_size % n_dev != 0:
        if data_parallel is True:
            raise ValueError(
                f"batch_size {batch_size} not divisible by {n_dev} devices"
            )
        return None
    if data_parallel is None and batch_size < 4 * n_dev:
        return None
    from audioanalysisdetector_tpu.parallel.mesh import make_mesh

    return make_mesh(n_dev, axis="data")


def would_use_dp(batch_size: int) -> bool:
    """Would ``fit(..., data_parallel=None)`` auto-shard this batch size
    over the local devices (for a BN-free model)?

    Callers that must build a model consistently with ``fit``'s decision
    (e.g. choosing ``bn_axis_name`` for a sync-BN model before opting in
    with ``data_parallel=True``) use this instead of re-deriving the
    thresholds — one source of truth, no drift.
    """
    return _pick_dp_mesh(batch_size, None, has_batch_stats=False) is not None


def fit(
    state: TrainState,
    train_data: tuple[np.ndarray, np.ndarray],
    val_data: tuple[np.ndarray, np.ndarray],
    *,
    loss_name: str = "CrossEntropyLoss",
    num_epochs: int = 10,
    batch_size: int = 16,
    seed: int = 0,
    run_dir: str | None = None,
    has_batch_stats: bool = True,
    binary_head: bool = False,
    step_fn: Callable | None = None,
    verbose: bool = False,
    plots: bool = True,
    data_parallel: bool | None = None,
) -> FitResult:
    """Generic epoch driver (the reference ``train_loop`` contract).

    ``data_parallel``: None (default) auto-enables the ``shard_map`` +
    ``pmean`` step over all local devices whenever there is more than one and
    ``batch_size`` divides evenly (train batches are always tail-padded to
    full size, so every step shards cleanly); True forces it, False disables.
    Gradients are pmean-reduced over ICI — numerically the global batch mean,
    identical to the single-device step up to float reassociation (dropout
    draws differ: shards decorrelate their masks by design, train/steps.py).
    Auto mode never engages for ``has_batch_stats=True`` models — per-shard
    BatchNorm forward statistics would change numerics without opt-in (see
    ``_pick_dp_mesh``); BN models pass ``data_parallel=True`` explicitly,
    ideally built with ``bn_axis_name`` for exact sync-BN parity.
    """
    loss_fn = get_loss(loss_name)
    mesh = (
        _pick_dp_mesh(batch_size, data_parallel, has_batch_stats)
        if step_fn is None
        else None
    )
    if mesh is not None:
        from audioanalysisdetector_tpu.train.steps import make_dp_train_step, replicate

        # donate=False: ``best_state`` aliases a previous step's buffers —
        # donating would invalidate the checkpointed state one step later
        step = make_dp_train_step(
            loss_fn, mesh, has_batch_stats=has_batch_stats,
            binary_head=binary_head, donate=False,
        )
        state = replicate(state, mesh)
    else:
        step = step_fn or jax.jit(
            make_train_step(loss_fn, has_batch_stats=has_batch_stats, binary_head=binary_head)
        )
    eval_step = jax.jit(
        make_eval_step(loss_fn, has_batch_stats=has_batch_stats, binary_head=binary_head)
    )
    rng = jax.random.PRNGKey(seed)

    logs: list[EpochLog] = []
    best_val = float("inf")
    worst_val = -float("inf")
    best_state = state
    best_epoch = -1

    for epoch in range(num_epochs):
        t0 = time.time()
        # metrics accumulate ON DEVICE; the host fetches once per epoch —
        # a per-step float() would force a device sync every step (69 ms
        # round-trip on tunneled runtimes, dwarfing the 16 ms step itself).
        # Accumulators initialize lazily from the first step's output so they
        # inherit its sharding (a zeros(()) committed to the default device
        # cannot be added to a mesh-replicated metric).
        tr_loss_d = tr_acc_d = None
        tr_n = 0.0
        for xb, yb, true in batch_iter(*train_data, batch_size, shuffle=True, seed=seed + epoch):
            rng, sub = jax.random.split(rng)
            state, m = step(state, xb, yb, sub)
            dl, da = m["loss"] * true, m["accuracy"] * true
            tr_loss_d = dl if tr_loss_d is None else tr_loss_d + dl
            tr_acc_d = da if tr_acc_d is None else tr_acc_d + da
            tr_n += true
        tr_loss = float(tr_loss_d) if tr_loss_d is not None else 0.0
        tr_acc = float(tr_acc_d) if tr_acc_d is not None else 0.0

        va_loss_d = va_acc_d = None
        va_n = 0.0
        # tail batch left unpadded (one extra compile) so the logged val loss
        # — and best-checkpoint selection — is exact, not padded-row-biased
        for xb, yb, true in batch_iter(*val_data, batch_size, shuffle=False, pad_tail=False):
            m = eval_step(state, xb, yb)
            dl, da = m["loss"] * true, m["accuracy"] * true
            va_loss_d = dl if va_loss_d is None else va_loss_d + dl
            va_acc_d = da if va_acc_d is None else va_acc_d + da
            va_n += true
        va_loss = float(va_loss_d) if va_loss_d is not None else 0.0
        va_acc = float(va_acc_d) if va_acc_d is not None else 0.0

        row = EpochLog(
            epoch=epoch,
            train_loss=tr_loss / max(tr_n, 1),
            train_acc=tr_acc / max(tr_n, 1),
            val_loss=va_loss / max(va_n, 1),
            val_acc=va_acc / max(va_n, 1),
            seconds=time.time() - t0,
        )
        logs.append(row)
        if verbose:
            print(
                f"epoch {epoch}: train loss {row.train_loss:.4f} acc {row.train_acc:.4f}"
                f" | val loss {row.val_loss:.4f} acc {row.val_acc:.4f} ({row.seconds:.1f}s)"
            )

        if row.val_loss < best_val:
            best_val = row.val_loss
            best_state = state
            best_epoch = epoch
            if run_dir:
                save_checkpoint(
                    os.path.join(run_dir, "best_model.msgpack"), state,
                    metadata={"epoch": epoch, "val_loss": row.val_loss},
                )
        if row.val_loss > worst_val:
            worst_val = row.val_loss
            if run_dir:
                save_checkpoint(
                    os.path.join(run_dir, "worst_model.msgpack"), state,
                    metadata={"epoch": epoch, "val_loss": row.val_loss},
                )

    if run_dir:
        _write_run_artifacts(
            run_dir, logs, loss_name=loss_name, num_epochs=num_epochs,
            batch_size=batch_size, best_epoch=best_epoch, best_val=best_val,
            final_state=state, plots=plots,
        )

    return FitResult(state=state, best_state=best_state, logs=logs, best_epoch=best_epoch)


def _write_run_artifacts(
    run_dir: str,
    logs: list[EpochLog],
    *,
    loss_name: str,
    num_epochs: int,
    batch_size: int,
    best_epoch: int,
    best_val: float,
    final_state: TrainState | None,
    plots: bool = True,
) -> None:
    """The per-run artifact contract shared by ``fit`` and ``fit_bucketed``:
    CSV + human txt + JSON epoch logs, final checkpoint, loss/accuracy PNGs
    (reference/ASV_dl_func.py:1332-1382)."""
    os.makedirs(run_dir, exist_ok=True)
    csv_rows = ["epoch,train_loss,train_acc,val_loss,val_acc,seconds"] + [
        f"{r.epoch},{r.train_loss:.6f},{r.train_acc:.6f},"
        f"{r.val_loss:.6f},{r.val_acc:.6f},{r.seconds:.3f}"
        for r in logs
    ]
    with open(os.path.join(run_dir, "training_log.csv"), "w") as f:
        f.write("\n".join(csv_rows) + "\n")
    # human-readable txt log (the reference's per-run training_log.txt,
    # reference/ASV_dl_func.py:1239-1243, 1348-1361)
    with open(os.path.join(run_dir, "training_log.txt"), "w") as f:
        f.write(f"Training | loss: {loss_name} | epochs: {num_epochs} "
                f"| batch: {batch_size}\n" + "=" * 80 + "\n")
        for row in logs:
            f.write(
                f"epoch {row.epoch}: train loss {row.train_loss:.6f} "
                f"acc {row.train_acc:.4f} | val loss {row.val_loss:.6f} "
                f"acc {row.val_acc:.4f} ({row.seconds:.2f}s)\n"
            )
        f.write(f"best epoch: {best_epoch} (val loss {best_val:.6f})\n")
    with open(os.path.join(run_dir, "logs.json"), "w") as f:
        json.dump([row.__dict__ for row in logs], f, indent=2)
    if final_state is not None:
        save_checkpoint(os.path.join(run_dir, "final_model.msgpack"), final_state)
    if plots:
        _save_plots(logs, run_dir)


def fit_bucketed(
    model,
    train_sequences: list[np.ndarray],
    train_labels: np.ndarray,
    val_sequences: list[np.ndarray],
    val_labels: np.ndarray,
    *,
    loss_name: str = "CrossEntropyLoss",
    optimizer_name: str = "Adam",
    lr: float = 1e-3,
    num_epochs: int = 5,
    batch_size: int = 16,
    n_buckets: int = 4,
    seed: int = 0,
    run_dir: str | None = None,
    verbose: bool = False,
    plots: bool = True,
) -> FitResult:
    """Ragged-corpus trainer: variable-length sequences over length buckets.

    Replaces the reference's per-batch ``pad_sequence`` collate
    (reference/ASV_dl_func.py:1220-1227), which under XLA would compile one
    program per distinct batch length. Sequences ``(T_i, F)`` are grouped by
    ``data.bucketing`` into a quantized length ladder, so the jitted step
    compiles at most ``len(ladder)`` shapes (asserted via
    ``FitResult.n_compiled_shapes``). Mask semantics follow the scorer's
    contract (reference/ASV_dl_func.py:1486-1489): padded frames are zero
    and each sequence's logits read its TRUE last step via ``lengths``.

    ``run_dir`` gets the same artifact contract as ``fit`` (best/worst
    checkpoints by val loss, CSV/txt/JSON logs, curves, final checkpoint —
    reference/ASV_dl_func.py:1332-1382).
    """
    import jax.numpy as jnp

    from audioanalysisdetector_tpu.data.bucketing import (
        bucketed_batches,
        make_bucket_ladder,
    )

    loss_per_row = get_loss_per_row(loss_name)
    feat_dim = train_sequences[0].shape[-1]
    ladder = make_bucket_ladder(
        np.asarray([len(s) for s in train_sequences] + [len(s) for s in val_sequences]),
        n_buckets,
    )

    rng = jax.random.PRNGKey(seed)
    variables = model.init(rng, jnp.zeros((1, ladder[-1], feat_dim)), train=False)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=make_optimizer(optimizer_name, lr),
    )

    # tail batches fill to batch_size with CYCLIC REPEATS of real rows
    # (static shapes); a 0/1 row mask excludes the repeats from both the
    # gradient and the metric sums, so the val loss that drives
    # best-checkpoint selection is exact over the true rows
    @jax.jit
    def train_step(state, x, lengths, y, mask, step_rng):
        def compute_loss(params):
            logits = state.apply_fn(
                {"params": params}, x, train=True, lengths=lengths,
                rngs={"dropout": step_rng},
            )
            loss = jnp.sum(loss_per_row(logits, y) * mask) / jnp.sum(mask)
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params
        )
        correct = (jnp.argmax(logits, -1) == y).astype(jnp.float32)
        return state.apply_gradients(grads), {
            "loss_sum": loss * jnp.sum(mask),
            "correct_sum": jnp.sum(correct * mask),
        }

    @jax.jit
    def eval_step(state, x, lengths, y, mask):
        logits = state.apply_fn({"params": state.params}, x, lengths=lengths)
        correct = (jnp.argmax(logits, -1) == y).astype(jnp.float32)
        return {
            "loss_sum": jnp.sum(loss_per_row(logits, y) * mask),
            "correct_sum": jnp.sum(correct * mask),
        }

    logs: list[EpochLog] = []
    best_val = float("inf")
    worst_val = -float("inf")
    best_state = state
    best_epoch = -1
    for epoch in range(num_epochs):
        t0 = time.time()
        tr_loss_d = jnp.zeros(())
        tr_acc_d = jnp.zeros(())
        tr_n = 0.0
        for xb, lb, yb, n_true in bucketed_batches(
            train_sequences, train_labels, batch_size,
            ladder=ladder, shuffle=True, seed=seed + epoch,
        ):
            rng, sub = jax.random.split(rng)
            mask = (np.arange(len(yb)) < n_true).astype(np.float32)
            state, m = train_step(state, xb, lb, yb, mask, sub)
            tr_loss_d = tr_loss_d + m["loss_sum"]
            tr_acc_d = tr_acc_d + m["correct_sum"]
            tr_n += n_true

        va_loss_d = jnp.zeros(())
        va_acc_d = jnp.zeros(())
        va_n = 0.0
        for xb, lb, yb, n_true in bucketed_batches(
            val_sequences, val_labels, batch_size, ladder=ladder, shuffle=False
        ):
            mask = (np.arange(len(yb)) < n_true).astype(np.float32)
            m = eval_step(state, xb, lb, yb, mask)
            va_loss_d = va_loss_d + m["loss_sum"]
            va_acc_d = va_acc_d + m["correct_sum"]
            va_n += n_true

        row = EpochLog(
            epoch=epoch,
            train_loss=float(tr_loss_d) / max(tr_n, 1),
            train_acc=float(tr_acc_d) / max(tr_n, 1),
            val_loss=float(va_loss_d) / max(va_n, 1),
            val_acc=float(va_acc_d) / max(va_n, 1),
            seconds=time.time() - t0,
        )
        logs.append(row)
        if verbose:
            print(
                f"epoch {epoch}: train loss {row.train_loss:.4f} acc {row.train_acc:.4f}"
                f" | val loss {row.val_loss:.4f} acc {row.val_acc:.4f}"
            )
        if row.val_loss < best_val:
            best_val, best_state, best_epoch = row.val_loss, state, epoch
            if run_dir:
                save_checkpoint(
                    os.path.join(run_dir, "best_model.msgpack"), state,
                    metadata={"epoch": epoch, "val_loss": row.val_loss},
                )
        if row.val_loss > worst_val:
            worst_val = row.val_loss
            if run_dir:
                save_checkpoint(
                    os.path.join(run_dir, "worst_model.msgpack"), state,
                    metadata={"epoch": epoch, "val_loss": row.val_loss},
                )

    if run_dir:
        _write_run_artifacts(
            run_dir, logs, loss_name=loss_name, num_epochs=num_epochs,
            batch_size=batch_size, best_epoch=best_epoch, best_val=best_val,
            final_state=state, plots=plots,
        )

    return FitResult(
        state=state, best_state=best_state, logs=logs, best_epoch=best_epoch,
        n_compiled_shapes=train_step._cache_size(),
    )


def _save_plots(logs: list[EpochLog], run_dir: str) -> None:
    """Loss/accuracy curves, the reference's per-run PNGs
    (reference/ASV_dl_func.py:1363-1382)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    epochs = [l.epoch for l in logs]
    for what, fname in (("loss", "loss_curve.png"), ("acc", "accuracy_curve.png")):
        fig, ax = plt.subplots(figsize=(7, 4))
        ax.plot(epochs, [getattr(l, f"train_{what}") for l in logs], label="train")
        ax.plot(epochs, [getattr(l, f"val_{what}") for l in logs], label="val")
        ax.set_xlabel("epoch")
        ax.set_ylabel(what)
        ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(run_dir, fname), dpi=100)
        plt.close(fig)


def evaluate(
    state: TrainState,
    data: tuple[np.ndarray, np.ndarray],
    *,
    loss_name: str = "CrossEntropyLoss",
    batch_size: int = 256,
    has_batch_stats: bool = True,
    binary_head: bool = False,
) -> dict[str, float]:
    """Final metrics on a dataset: accuracy, F1, EER (+ mean loss)."""
    if len(data[1]) == 0:
        # e.g. every row of a split dropped by filtr_nan — fail with a
        # named cause, not np.concatenate([]) / divide-by-zero
        raise ValueError("evaluate: empty dataset (no rows after filtering)")
    eval_step = jax.jit(
        make_eval_step(get_loss(loss_name), has_batch_stats=has_batch_stats, binary_head=binary_head)
    )
    preds, scores, losses, counts = [], [], [], []
    for xb, yb, true in batch_iter(*data, batch_size, shuffle=False, pad_tail=False):
        m = eval_step(state, xb, yb)
        preds.append(np.asarray(m["preds"]))
        scores.append(np.asarray(m["scores"]))
        losses.append(float(m["loss"]) * true)
        counts.append(true)
    y_true = data[1]
    y_pred = np.concatenate(preds)
    y_score = np.concatenate(scores)
    out = M.model_result_metrics(y_true, y_pred, y_score)
    out["loss"] = float(np.sum(losses) / np.sum(counts))
    return out


def bilstm_pipeline(
    train_data: tuple[np.ndarray, np.ndarray],
    test_data: tuple[np.ndarray, np.ndarray],
    *,
    num_epochs: int = 100,
    criterion_name: str = "CrossEntropyLoss",
    optimizer_name: str = "Adam",
    lr: float = 1e-4,
    batch_size: int = 16,
    hidden: int = 128,
    model_dir: str = "GMM-BiLSTM",
    seed: int = 0,
    verbose: bool = False,
) -> tuple[FitResult, dict[str, float]]:
    """The flagship trainer (reference ``BiLSTM_model`` contract):
    config-named run dir, best/worst checkpoints, CSV/JSON logs + plots,
    final accuracy/F1/EER of the best state.

    ``train_data[0]``: time-major CQCC ``(N, T, F)`` float32; labels int.
    """
    from audioanalysisdetector_tpu.models.bilstm_classifier import BiLSTMClassifier

    config_name = f"{optimizer_name}_{criterion_name}_lr{lr}".replace(".", "_")
    run_dir = os.path.join(model_dir, config_name)
    os.makedirs(run_dir, exist_ok=True)

    x_train, y_train = train_data
    model = BiLSTMClassifier(hidden=hidden)
    variables = model.init(
        jax.random.PRNGKey(seed), jax.numpy.asarray(x_train[:1]), train=False
    )
    tx = make_optimizer(optimizer_name, lr)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx, batch_stats={}
    )
    result = fit(
        state,
        train_data,
        test_data,
        loss_name=criterion_name,
        num_epochs=num_epochs,
        batch_size=batch_size,
        seed=seed,
        run_dir=run_dir,
        has_batch_stats=False,
        verbose=verbose,
    )
    final = evaluate(
        result.best_state, test_data, loss_name=criterion_name, has_batch_stats=False
    )
    with open(os.path.join(run_dir, "metrics.json"), "w") as f:
        json.dump(final, f, indent=2)
    return result, final
