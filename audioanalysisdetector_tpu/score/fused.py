"""Batched fused GMM ⊕ BiLSTM spoof scorer — the public scoring API.

The reference scores one utterance at a time with a host↔device round-trip
per sample (``fused_score``, reference/ASV_dl_func.py:1448-1462, called from
the per-sample loop at :1483-1491 — its 201 utt/s bottleneck). The TPU
build scores the whole evaluation set as device-resident batches:

  score = 0.5 * softmax(BiLSTM(x))[:, spoof] + 0.5 * sigmoid(GMM LLR_spoof)

with the reference's semantics: non-padded frames recovered by the
``row.sum(axis=-1) != 0`` mask, empty sequences scoring 0.5, decision
threshold 0.5, 0.5/0.5 weights (reference/ASV_dl_func.py:1486-1491).

One documented deviation: the reference's formula literally fuses the
network's P(spoof) with ``sigmoid(ll_genuine - ll_spoof)``
(reference/ASV_dl_func.py:1459-1462) — a *genuine*-polarity term whose
effective sign depends on the notebooks' unrecoverable label wiring. Taken
literally with the ASVspoof convention (spoof = 1) the two halves cancel;
this build fuses both halves in spoof polarity
(``LLR_spoof = ll_spoof - ll_genuine``), which the end-to-end learning
test verifies actually separates the classes.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from audioanalysisdetector_tpu.models.gmm import DiagGMM, masked_llr
from audioanalysisdetector_tpu.train import metrics as M


def padding_mask(x: jnp.ndarray) -> jnp.ndarray:
    """Valid-frame mask: frame is real iff its coefficient sum is non-zero
    (the reference's pad-recovery rule, reference/ASV_dl_func.py:1486)."""
    return jnp.sum(x, axis=-1) != 0.0


def arm_scores(
    bilstm_apply: Callable,
    variables: dict,
    gmm_genuine: DiagGMM,
    gmm_spoof: DiagGMM,
    x: jnp.ndarray,
    *,
    gmm_feature_fn: Callable | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Both arms of the fusion for a batch: x (B, T, F) ->
    (bilstm_prob (B,), llr_spoof (B,), empty (B,) bool).

    ``gmm_feature_fn`` optionally transforms the GMM arm's frames (e.g.
    ``train.gmm_system.add_sequence_deltas`` for the CQCC+Δ+ΔΔ GMM recipe);
    the padding mask is computed from the RAW x (the reference's pad rule)
    and the BiLSTM arm always sees the raw features.
    """
    logits = bilstm_apply(variables, x, train=False)
    bilstm_prob = jax.nn.softmax(logits, axis=-1)[:, 1]
    mask = padding_mask(x)
    gx = gmm_feature_fn(x) if gmm_feature_fn is not None else x
    # spoof-polarity LLR (see module docstring on the reference's inverted term)
    llr_spoof = masked_llr(gx, mask, gmm_spoof, gmm_genuine)
    empty = jnp.sum(mask, axis=-1) == 0
    return bilstm_prob, llr_spoof, empty


def fused_scores(
    bilstm_apply: Callable,
    variables: dict,
    gmm_genuine: DiagGMM,
    gmm_spoof: DiagGMM,
    x: jnp.ndarray,
    *,
    weight: float = 0.5,
    llr_scale: float = 1.0,
    llr_bias: float = 0.0,
    gmm_feature_fn: Callable | None = None,
) -> jnp.ndarray:
    """Fused spoof probabilities for a batch: x (B, T, F) -> (B,).

    ``llr_scale``/``llr_bias`` optionally Platt-calibrate the GMM arm
    (``sigmoid(scale * LLR + bias)``; fit them on a train split with
    ``fit_llr_calibration``). The defaults are the reference's literal
    ``sigmoid(LLR)`` (reference/ASV_dl_func.py:1459-1462).
    """
    bilstm_prob, llr_spoof, empty = arm_scores(
        bilstm_apply, variables, gmm_genuine, gmm_spoof, x,
        gmm_feature_fn=gmm_feature_fn,
    )
    gmm_prob = jax.nn.sigmoid(llr_scale * llr_spoof + llr_bias)
    score = weight * bilstm_prob + (1.0 - weight) * gmm_prob
    return jnp.where(empty, 0.5, score)


def make_fused_scorer(
    bilstm_apply: Callable,
    variables: dict,
    gmm_genuine: DiagGMM,
    gmm_spoof: DiagGMM,
    *,
    weight: float = 0.5,
    llr_scale: float = 1.0,
    llr_bias: float = 0.0,
    gmm_feature_fn: Callable | None = None,
) -> Callable:
    """Jitted batch scorer ``(B, T, F) -> (B,)`` with everything closed over."""
    return jax.jit(
        partial(
            fused_scores, bilstm_apply, variables, gmm_genuine, gmm_spoof,
            weight=weight, llr_scale=llr_scale, llr_bias=llr_bias,
            gmm_feature_fn=gmm_feature_fn,
        )
    )


def make_arm_scorer(
    bilstm_apply: Callable,
    variables: dict,
    gmm_genuine: DiagGMM,
    gmm_spoof: DiagGMM,
    *,
    gmm_feature_fn: Callable | None = None,
) -> Callable:
    """Jitted ``(B, T, F) -> (bilstm_prob, llr, empty)`` batch scorer —
    per-arm diagnostics (GMM-alone EER, calibration fitting) in one pass."""
    return jax.jit(
        partial(
            arm_scores, bilstm_apply, variables, gmm_genuine, gmm_spoof,
            gmm_feature_fn=gmm_feature_fn,
        )
    )


def fit_llr_calibration(
    llrs: np.ndarray, y_true: np.ndarray, *, iters: int = 50
) -> tuple[float, float]:
    """Platt scaling of the GMM arm: fit (scale, bias) of
    ``P(spoof) = sigmoid(scale * LLR + bias)`` by Newton-Raphson logistic
    regression on a train split (host-side; the problem is 2-parameter).

    Useful when the mean-frame LLR's natural scale saturates the sigmoid
    (uncalibrated, a saturated arm degrades fusion to a hard vote). Returns
    (1.0, 0.0)-compatible floats to feed ``make_fused_scorer``.
    """
    llrs = np.asarray(llrs, np.float64)
    y = np.asarray(y_true, np.float64)
    n = len(y)
    a, b = 1.0, 0.0
    for _ in range(iters):
        z = np.clip(a * llrs + b, -30.0, 30.0)
        p = 1.0 / (1.0 + np.exp(-z))
        g_a, g_b = np.sum((p - y) * llrs), np.sum(p - y)
        w = np.maximum(p * (1.0 - p), 1e-6)
        # N-scaled ridge keeps the Hessian well-conditioned when the LLRs
        # are (near-)constant — an undamped step there is O(1/ridge) and the
        # iterates explode into a saturated hard vote
        ridge = 1e-4 * n
        h_aa = np.sum(w * llrs * llrs) + ridge
        h_bb = np.sum(w) + ridge
        h_ab = np.sum(w * llrs)
        det = h_aa * h_bb - h_ab * h_ab
        da = (h_bb * g_a - h_ab * g_b) / det
        db = (h_aa * g_b - h_ab * g_a) / det
        # trust region: cap the step so one bad Hessian cannot diverge it
        step = max(abs(da), abs(db))
        if step > 5.0:
            da, db = da * 5.0 / step, db * 5.0 / step
        a, b = a - da, b - db
        if step < 1e-10:
            break
    return float(a), float(b)


def fit_decision_threshold(scores: np.ndarray, y_true: np.ndarray) -> float:
    """Operating threshold at the EER point of a labeled split (host-side).

    The reference hard-codes 0.5 (reference/ASV_dl_func.py:1491) — kept as
    the default decision contract everywhere. Real deployments pick the
    operating point on a development split instead: with calibrated but
    asymmetric arms the fused score can rank perfectly (EER 0) while the
    fixed 0.5 line sits off-center. Returns the candidate threshold
    minimizing |FPR − FNR| (ties broken toward lower total error), swept
    over midpoints between adjacent distinct scores.
    """
    s = np.asarray(scores, np.float64)
    y = np.asarray(y_true)
    neg, pos = s[y == 0], s[y == 1]
    if len(neg) == 0 or len(pos) == 0:
        return 0.5
    uniq = np.unique(s)
    cands = np.concatenate(
        [[uniq[0] - 1.0], (uniq[:-1] + uniq[1:]) / 2.0, [uniq[-1] + 1.0]]
    )
    fpr = (neg[None, :] > cands[:, None]).mean(axis=1)
    fnr = (pos[None, :] <= cands[:, None]).mean(axis=1)
    best = np.lexsort((fpr + fnr, np.abs(fpr - fnr)))[0]
    return float(cands[best])


def eval_fused(
    scorer: Callable,
    x: np.ndarray,
    y_true: np.ndarray,
    *,
    batch_size: int = 512,
    threshold: float = 0.5,
) -> tuple[np.ndarray, np.ndarray, dict[str, float]]:
    """Reference ``eval_model`` contract: (y_true, y_pred, {accuracy, f1, eer}).

    Pads the tail batch so every device call has a static shape.
    """
    n = len(y_true)
    scores = np.empty(n, dtype=np.float64)
    for start in range(0, n, batch_size):
        xb = x[start : start + batch_size]
        true = len(xb)
        if true < batch_size:
            xb = np.concatenate([xb, np.repeat(xb[-1:], batch_size - true, axis=0)])
        scores[start : start + true] = np.asarray(scorer(jnp.asarray(xb)))[:true]
    y_pred = (scores > threshold).astype(np.int64)
    metrics = {
        "accuracy": M.accuracy(y_true, y_pred),
        "f1": M.f1_binary(y_true, y_pred),
        "eer": M.eer(y_true, scores),
    }
    return np.asarray(y_true), y_pred, metrics
