"""Gradient & perturbation attribution: saliency, IG, occlusion, Grad-CAM.

TPU-native counterparts of the reference's Captum usage
(reference/tets_xai.py:70-91 — IntegratedGradients with zero baseline and
Occlusion with a (5, 1) window over (T, F) inputs; ASV_deep_learning.ipynb
cell 34 — LayerGradCam on the last residual block). Everything is
``jax.grad``/``vmap`` over the compiled forward: no hooks, no many-forward
host loops.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _target_score(apply_fn: Callable, variables: dict, x: jnp.ndarray, target: int) -> jnp.ndarray:
    out = apply_fn(variables, x, train=False)
    if out.shape[-1] == 1:  # sigmoid/logit single head
        return out[..., 0]
    return out[..., target]


def saliency(
    apply_fn: Callable, variables: dict, x: jnp.ndarray, *, target: int = 1
) -> jnp.ndarray:
    """|d score_target / d x| per input element (vanilla gradient saliency)."""
    grad_fn = jax.grad(lambda xi: jnp.sum(_target_score(apply_fn, variables, xi, target)))
    return jnp.abs(grad_fn(x))


def integrated_gradients(
    apply_fn: Callable,
    variables: dict,
    x: jnp.ndarray,
    *,
    target: int = 1,
    steps: int = 50,
    baseline: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Riemann-sum integrated gradients from ``baseline`` (default zeros) —
    Captum's contract (reference/tets_xai.py:75-78). Steps scanned to keep
    memory flat; shapes static."""
    if baseline is None:
        baseline = jnp.zeros_like(x)
    delta = x - baseline
    grad_fn = jax.grad(lambda xi: jnp.sum(_target_score(apply_fn, variables, xi, target)))
    alphas = (jnp.arange(steps, dtype=x.dtype) + 0.5) / steps

    def body(acc, alpha):
        return acc + grad_fn(baseline + alpha * delta), None

    total, _ = jax.lax.scan(body, jnp.zeros_like(x), alphas)
    return delta * total / steps


def occlusion(
    apply_fn: Callable,
    variables: dict,
    x: jnp.ndarray,
    *,
    target: int = 1,
    window: tuple[int, int] = (5, 1),
    baseline: float = 0.0,
) -> jnp.ndarray:
    """Sliding-window occlusion over the last two axes of ``x`` (B, T, F).

    Each position's attribution is the score drop when the window covering
    it is replaced by ``baseline``; overlapping windows average (Captum
    semantics, stride 1). All occluded variants are scored as one batched
    forward per window position via ``vmap``.
    """
    import numpy as np

    B, T, F = x.shape
    wt, wf = window
    n_t, n_f = T - wt + 1, F - wf + 1
    positions = [(t, f) for t in range(n_t) for f in range(n_f)]
    pos = jnp.asarray(positions)  # (P, 2)

    base_score = _target_score(apply_fn, variables, x, target)  # (B,)

    t_idx = jnp.arange(T)
    f_idx = jnp.arange(F)

    def occlude_and_score(p):
        t0, f0 = p[0], p[1]
        mask = (
            (t_idx[:, None] >= t0) & (t_idx[:, None] < t0 + wt)
            & (f_idx[None, :] >= f0) & (f_idx[None, :] < f0 + wf)
        )  # (T, F)
        x_occ = jnp.where(mask[None], baseline, x)
        return base_score - _target_score(apply_fn, variables, x_occ, target)  # (B,)

    diffs = jax.lax.map(occlude_and_score, pos, batch_size=64)  # (P, B)
    # each cell's attribution = mean of the diffs of windows covering it.
    # The scatter is a FULL cross-correlation of the window-diff grid with a
    # ones(wt, wf) kernel — no (P, T, F) mask tensor is ever materialized
    # (at 400x64 / (5,1) that tensor is ~2.6 GB f32; the grid is ~100 KB).
    grid = diffs.T.reshape(B, 1, n_t, n_f)
    kernel = jnp.ones((1, 1, wt, wf), x.dtype)
    heat = jax.lax.conv_general_dilated(
        grid, kernel, window_strides=(1, 1),
        padding=[(wt - 1, wt - 1), (wf - 1, wf - 1)],
    )[:, 0]  # (B, T, F)
    # overlap counts are static: same correlation of a ones grid, on host
    ones_grid = np.ones((1, 1, n_t, n_f), np.float32)
    counts = jax.lax.conv_general_dilated(
        jnp.asarray(ones_grid), kernel.astype(jnp.float32),
        window_strides=(1, 1), padding=[(wt - 1, wt - 1), (wf - 1, wf - 1)],
    )[0, 0]  # (T, F)
    return heat / jnp.maximum(counts.astype(x.dtype), 1.0)


def grad_cam(
    model,
    variables: dict,
    x: jnp.ndarray,
    *,
    target: int = 1,
    output_size: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Grad-CAM on the last residual block of an AntiSpoofingResNet-family
    model: channel weights = spatially pooled gradients; CAM = ReLU of the
    weighted channel sum, optionally resized to the input geometry
    (the reference uses cv2.resize; here ``jax.image.resize``)."""
    fmap = model.apply(variables, x, method="feature_maps")  # (B, H, W, C)

    def score_from_fmap(f):
        out = model.apply(variables, f, method="classify_features")
        if out.shape[-1] == 1:
            return jnp.sum(out[..., 0])
        return jnp.sum(out[..., target])

    grads = jax.grad(score_from_fmap)(fmap)  # (B, H, W, C)
    weights = jnp.mean(grads, axis=(1, 2), keepdims=True)  # GAP over space
    cam = jax.nn.relu(jnp.sum(weights * fmap, axis=-1))  # (B, H, W)
    if output_size is not None:
        cam = jax.image.resize(cam, (cam.shape[0], *output_size), method="bilinear")
    return cam


# ------------------------------------------------- reference reductions


def bilstm_heatmaps(
    apply_fn: Callable, variables: dict, x: jnp.ndarray, *, target: int = 1, steps: int = 50
) -> dict[str, jnp.ndarray]:
    """The reference's ``compute_bilstm_heatmaps`` reductions
    (reference/tets_xai.py:70-91): IG feature importance = mean |IG| over
    time; occlusion time importance = sum |occ| over features."""
    ig = integrated_gradients(apply_fn, variables, x, target=target, steps=steps)
    occ = occlusion(apply_fn, variables, x, target=target, window=(5, 1))
    return {
        "ig": ig,
        "occlusion": occ,
        "feature_importance": jnp.mean(jnp.abs(ig), axis=-2),  # (B, F)
        "time_importance": jnp.sum(jnp.abs(occ), axis=-1),  # (B, T)
    }
