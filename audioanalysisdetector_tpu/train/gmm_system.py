"""GMM-UBM system orchestration: UBM fit + per-class MAP + persistence.

Counterpart of ``gmm_model`` / ``load_gmm_models``
(reference/ASV_dl_func.py:1132-1170): fit a 128-component diagonal UBM on
all training frames, MAP-adapt genuine (label 0) and spoof (label 1)
models, persist all three. Storage is npz (no pickle). The reference's UBM
EM takes 478.85 s on CPU; this path runs the flat GEMM EM on device off a
single uploaded frame buffer shared by EM and both MAP adaptations.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

from audioanalysisdetector_tpu.models.gmm import (
    DiagGMM,
    fit_em,
    from_numpy,
    map_adapt,
    map_adapt_chunked,
    to_numpy,
)


def _stack_frames(seqs: np.ndarray) -> np.ndarray:
    """(N, T, F) sequences -> (N*T, F) frames (vstack of feature cells)."""
    seqs = np.asarray(seqs)
    return seqs.reshape(-1, seqs.shape[-1])


def add_sequence_deltas(seqs, *, width: int = 9):
    """(…, T, F) time-major sequences -> (…, T, 3F): append Δ and ΔΔ along
    the coefficient axis.

    The classic ASVspoof CQCC-GMM recipe models static+Δ+ΔΔ frames — the
    GMM is frame-independent, so without deltas it is blind to temporal
    dynamics the BiLSTM arm sees. Deltas are Savitzky-Golay over the time
    axis (librosa semantics, ``frontend.mfcc.delta``). Jit-safe; apply the
    SAME transform at train and score time (``train_gmm_system(deltas=True)``
    + ``make_arm_scorer(gmm_feature_fn=add_sequence_deltas)``).
    """
    import jax.numpy as jnp

    from audioanalysisdetector_tpu.frontend.mfcc import delta

    d1 = delta(seqs, width=width, order=1, axis=-2)
    d2 = delta(seqs, width=width, order=2, axis=-2)
    return jnp.concatenate([seqs, d1, d2], axis=-1)


def sequence_cmvn(seqs, *, variance: bool = True):
    """(…, T, F) -> per-utterance cepstral mean (and variance) normalization
    over the TIME axis.

    A transmission channel is (to first order) a convolution, i.e. an
    additive offset in the cepstral domain — per-utterance mean subtraction
    removes it. The reference's CQCC-GMM feeds raw frames
    (reference/ASV_dl_func.py:1132-1203), fine on single-channel LA train
    data but not under the channel variation the eval partitions (and the
    recipe-v5 surrogate corpus) carry. Jit-safe; unmasked — the flagship
    path feeds fixed-length 2-s chunks, so there are no padded frames to
    exclude (mirrors :func:`add_sequence_deltas`'s contract). Apply the
    SAME transform at train and score time via :func:`make_gmm_feature_fn`.
    """
    from audioanalysisdetector_tpu.frontend.mfcc import cmvn

    return cmvn(seqs, axis=-2, variance=variance)


def make_gmm_feature_fn(*, deltas: bool = False, cmvn: bool = False):
    """Compose the GMM arm's frame transform; returns ``None`` for identity.

    Order is deltas-then-CMVN, matching ``frontend.mfcc.mfcc_deltas_cmvn``
    (normalize every modelled dimension, Δ/ΔΔ included). The same callable
    must be given to both ``train_gmm_system(feature_fn=...)`` and
    ``score.make_arm_scorer(gmm_feature_fn=...)``.
    """
    if not deltas and not cmvn:
        return None

    def fn(seqs):
        if deltas:
            seqs = add_sequence_deltas(seqs)
        if cmvn:
            seqs = sequence_cmvn(seqs)
        return seqs

    return fn


def train_gmm_system(
    train_seqs: np.ndarray,
    labels: np.ndarray,
    *,
    n_components: int = 128,
    max_iter: int = 100,
    relevance_factor: float = 10.0,
    adapt_mode: str = "means",
    var_floor_rel: float = 1e-3,
    deltas: bool = False,
    cmvn: bool = False,
    model_dir: str = "GMM-BiLSTM",
    seed: int = 42,
    verbose: bool = False,
) -> tuple[DiagGMM, DiagGMM, DiagGMM]:
    """Returns (ubm, gmm_genuine, gmm_spoof) and persists them in model_dir.

    ``adapt_mode``: ``"means"`` (default) = Reynolds-style means-only MAP;
    ``"full"`` = the reference's means+variances+weights update
    (reference/ASV_dl_func.py:1172-1197). The reference default is NOT the
    system default because variance adaptation measurably destabilizes the
    LLR (see ``models.gmm.map_adapt`` docstring: surrogate eval rank-EER
    0.58 full vs 0.275 means-only, with saturated/inverted LLRs in the full
    mode) — fixed-with-a-pointer per SURVEY.md §7. ``var_floor_rel``
    guards the UBM EM against variance collapse for the same reason.

    ``deltas``/``cmvn`` select the GMM frame transform (see
    :func:`make_gmm_feature_fn`); score with the SAME transform via
    ``make_arm_scorer(gmm_feature_fn=make_gmm_feature_fn(deltas=..., cmvn=...))``.
    """
    if adapt_mode not in ("means", "full"):
        raise ValueError(f"adapt_mode must be 'means' or 'full', got {adapt_mode!r}")
    os.makedirs(model_dir, exist_ok=True)
    labels = np.asarray(labels)

    import jax
    import jax.numpy as jnp

    # ONE upload: EM and both MAP adaptations share this device buffer —
    # the class split is a 0/1 frame-weight mask, not a second transfer
    # (the host->device link is the scarce resource on tunneled runtimes)
    feature_fn = make_gmm_feature_fn(deltas=deltas, cmvn=cmvn)
    if feature_fn is not None:
        # the transform runs ON DEVICE from the uploaded static frames
        # (uploading e.g. the 3F-wide delta frames would triple the H2D
        # bytes for data the device can derive with two small GEMMs)
        seqs = jax.device_put(
            np.ascontiguousarray(np.asarray(train_seqs), dtype=np.float32)
        )
        xd = jax.jit(
            lambda s: feature_fn(s).reshape(s.shape[0] * s.shape[1], -1)
        )(seqs)
        n_frames = xd.shape[0]
    else:
        all_frames = _stack_frames(train_seqs)
        xd = jax.device_put(np.ascontiguousarray(all_frames, dtype=np.float32))
        n_frames = len(all_frames)
    frames_per_seq = int(np.asarray(train_seqs).shape[1])
    frame_labels = np.repeat(labels, frames_per_seq)

    t0 = time.time()
    ubm = fit_em(
        xd, n_components, max_iter=max_iter, seed=seed,
        var_floor_rel=var_floor_rel, verbose=verbose,
    )
    t_ubm = time.time() - t0
    if verbose:
        print(f"UBM EM done in {t_ubm:.2f}s on {n_frames} frames")

    full = adapt_mode == "full"
    t0 = time.time()
    # ONE compiled program per class instead of ~15 op-by-op dispatches —
    # on tunneled runtimes each eager op is a separate RPC (CLAUDE.md:
    # never run repo jnp code eagerly on the TPU). The flat path
    # materializes the (N, K) responsibility matrix; past fit_em's same
    # HBM budget the chunked-scan accumulator takes over (a 25M-frame
    # LA-scale corpus at K=128 is ~13 GB flat — OOM after the expensive
    # EM already succeeded).
    adapt = (
        map_adapt
        if n_frames * n_components * 4 <= (2 << 30)
        else map_adapt_chunked
    )
    map_jit = jax.jit(
        lambda g, x, w: adapt(
            g, x, relevance_factor=relevance_factor, frame_weights=w,
            adapt_vars=full, adapt_weights=full,
        )
    )
    w_genuine = jnp.asarray((frame_labels == 0).astype(np.float32))
    gmm_genuine = map_jit(ubm, xd, w_genuine)
    w_spoof = jnp.asarray((frame_labels == 1).astype(np.float32))
    gmm_spoof = map_jit(ubm, xd, w_spoof)
    if verbose:
        print(f"MAP adaptation done in {time.time() - t0:.2f}s")

    for name, g in (("ubm", ubm), ("gmm_genuine", gmm_genuine), ("gmm_df", gmm_spoof)):
        np.savez(os.path.join(model_dir, f"{name}.npz"), **to_numpy(g))
    # persist the frame transform NEXT TO the models — a GMM trained on
    # CMVN/delta frames scored on raw frames diverges silently (wrong
    # LLRs, no shape error); the loader side recomposes it from this
    with open(os.path.join(model_dir, "feature_transform.json"), "w") as f:
        json.dump({"deltas": bool(deltas), "cmvn": bool(cmvn)}, f)
    return ubm, gmm_genuine, gmm_spoof


def load_gmm_models(model_dir: str) -> tuple[DiagGMM, DiagGMM, DiagGMM]:
    out = []
    for name in ("ubm", "gmm_genuine", "gmm_df"):
        with np.load(os.path.join(model_dir, f"{name}.npz")) as z:
            out.append(from_numpy({k: z[k] for k in z.files}))
    return tuple(out)


def load_gmm_feature_fn(model_dir: str):
    """Recompose the frame transform the saved GMMs were trained with
    (``feature_transform.json``, written by :func:`train_gmm_system`).
    Returns ``None`` for identity — including for model dirs written before
    the metadata existed, which were all trained on raw frames."""
    path = os.path.join(model_dir, "feature_transform.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        d = json.load(f)
    return make_gmm_feature_fn(deltas=d.get("deltas", False), cmvn=d.get("cmvn", False))


def load_bilstm_model(model_dir: str, hidden: int = 128, input_dim: int = 19):
    """Convenience loader for a trained BiLSTM checkpoint
    (the reference's ``load_bilstm_model``, reference/ASV_dl_func.py:1768-1773):
    returns (model, variables) ready for the fused scorer."""
    import glob
    import os as _os

    import jax
    import jax.numpy as jnp

    from audioanalysisdetector_tpu.models.bilstm_classifier import BiLSTMClassifier
    from audioanalysisdetector_tpu.train.checkpoint import load_payload

    candidates = sorted(
        glob.glob(_os.path.join(model_dir, "**", "best_model.msgpack"), recursive=True)
    )
    if not candidates:
        raise FileNotFoundError(f"no best_model.msgpack under {model_dir}")
    payload = load_payload(candidates[0])
    model = BiLSTMClassifier(hidden=hidden)
    # real shape check against a fresh init: a checkpoint trained with a
    # different hidden/input_dim must fail HERE with a named path, not as
    # a matmul shape error deep in the fused scorer (or silently, if the
    # shapes happen to coincide)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, input_dim)), train=False)
    ref_shapes = jax.tree.map(jnp.shape, ref["params"])
    got_shapes = jax.tree.map(jnp.shape, payload["params"])
    if ref_shapes != got_shapes:
        raise ValueError(
            f"checkpoint {candidates[0]} does not match "
            f"BiLSTMClassifier(hidden={hidden}, input_dim={input_dim}): "
            f"expected {ref_shapes}, got {got_shapes}"
        )
    return model, {"params": payload["params"]}


def eval_model(
    bilstm_apply,
    bilstm_variables: dict,
    train_seqs: np.ndarray | None,
    train_labels: np.ndarray | None,
    test_seqs: np.ndarray,
    test_labels: np.ndarray,
    *,
    model_dir: str = "GMM-BiLSTM",
    use_saved_models: bool = True,
    n_components: int = 128,
    batch_size: int = 512,
    verbose: bool = True,
):
    """The reference's ``eval_model`` orchestration
    (reference/ASV_dl_func.py:1467-1515): load saved per-class GMMs if
    present (else train them from the train split), then run the batched
    fused scorer over the test set. Returns (y_true, y_pred, metrics)."""
    from audioanalysisdetector_tpu.score.fused import eval_fused, make_fused_scorer

    have_saved = use_saved_models and all(
        os.path.exists(os.path.join(model_dir, f"{n}.npz"))
        for n in ("ubm", "gmm_genuine", "gmm_df")  # loader reads all three
    )
    if have_saved:
        _, gmm_genuine, gmm_spoof = load_gmm_models(model_dir)
        # score with the SAME frame transform the saved models were trained
        # with (identity for this function's own training path below, and
        # for pre-metadata model dirs)
        feature_fn = load_gmm_feature_fn(model_dir)
    else:
        if train_seqs is None:
            raise ValueError("train data required to train GMMs when none are saved")
        _, gmm_genuine, gmm_spoof = train_gmm_system(
            train_seqs, train_labels, n_components=n_components,
            model_dir=model_dir, verbose=verbose,
        )
        feature_fn = None
    t0 = time.time()
    scorer = make_fused_scorer(
        bilstm_apply, bilstm_variables, gmm_genuine, gmm_spoof,
        gmm_feature_fn=feature_fn,
    )
    y_true, y_pred, metrics = eval_fused(
        scorer, test_seqs, test_labels, batch_size=batch_size
    )
    if verbose:
        print(f"evaluation finished in {time.time() - t0:.2f}s: {metrics}")
    return y_true, y_pred, metrics
