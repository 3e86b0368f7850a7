"""LIME-style perturbation explanations for the GMM⊕BiLSTM system.

TPU-native counterpart of reference/xai_func.py: perturbation primitives
(random coefficient rows replaced by their means, :451-463; time-slice
segmentation perturbation, :421-449), cosine-distance kernel weighting
``sqrt(exp(-d^2 / 0.25^2))`` (:360-388), and a weighted linear-regression
surrogate over perturbation masks (:38-176, :178-296).

Perturbation generation and scoring are batched on device; the tiny
surrogate fit stays on host (sklearn), matching the reference's use of
``LinearRegression``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def perturb_random_features_mean(
    x: jnp.ndarray, key: jax.Array, *, n_changed: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Replace ``n_changed`` random coefficient rows of ``(F, T)`` with their
    row means. Returns (perturbed, mask) with mask (F,) — 0 where changed
    (the reference's convention: active = 1)."""
    F = x.shape[-2]
    scores = jax.random.uniform(key, (F,))
    thresh = jnp.sort(scores)[n_changed - 1] if n_changed > 0 else -jnp.inf
    changed = scores <= thresh  # exactly n_changed rows (ties measure-zero)
    row_means = jnp.mean(x, axis=-1, keepdims=True)
    perturbed = jnp.where(changed[:, None], row_means, x)
    return perturbed, (~changed).astype(jnp.float32)


def signal_segmentation(T: int, num_slices: int) -> np.ndarray:
    """Slice boundaries over the time axis (host, static)."""
    edges = np.linspace(0, T, num_slices + 1).astype(int)
    return np.stack([edges[:-1], edges[1:]], axis=1)  # (num_slices, 2)


def perturb_segments(
    x: jnp.ndarray, key: jax.Array, *, num_slices: int, n_changed: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Replace ``n_changed`` random time slices of ``(F, T)`` with their
    per-slice means. Returns (perturbed, mask (num_slices,))."""
    T = x.shape[-1]
    seg = signal_segmentation(T, num_slices)
    scores = jax.random.uniform(key, (num_slices,))
    thresh = jnp.sort(scores)[n_changed - 1] if n_changed > 0 else -jnp.inf
    changed = scores <= thresh
    out = x
    for s, (lo, hi) in enumerate(seg):
        slice_mean = jnp.mean(x[..., lo:hi], axis=-1, keepdims=True)
        out = jnp.where(changed[s], out.at[..., lo:hi].set(slice_mean), out)
    return out, (~changed).astype(jnp.float32)


def kernel_weights(masks: np.ndarray, *, width: float = 0.25) -> np.ndarray:
    """Cosine-distance LIME kernel: ``sqrt(exp(-d^2 / width^2))`` to all-ones
    (reference/xai_func.py:360-388)."""
    ones = np.ones(masks.shape[1])
    dots = masks @ ones
    norms = np.linalg.norm(masks, axis=1) * np.linalg.norm(ones)
    cos_sim = np.where(norms > 0, dots / np.maximum(norms, 1e-12), 0.0)
    d = 1.0 - cos_sim
    return np.sqrt(np.exp(-(d**2) / width**2))


def fit_surrogate(
    masks: np.ndarray, scores: np.ndarray, weights: np.ndarray
):
    """Weighted LinearRegression surrogate (host, sklearn)."""
    from sklearn.linear_model import LinearRegression

    reg = LinearRegression()
    reg.fit(masks, scores, sample_weight=weights)
    return reg


def lime_single_instance(
    scorer: Callable,
    instance: np.ndarray,
    *,
    mode: str = "feature",
    n_perturbations: int = 30,
    num_slices: int = 9,
    n_changed: int = 4,
    top_k: int = 5,
    seed: int = 0,
):
    """Single-instance LIME (reference ``test_lime_on_single_instance``,
    reference/xai_func.py:178-296).

    ``scorer`` maps a batch of instances (B, F, T) -> spoof scores (B,);
    ``instance`` is one (F, T) feature map. Returns a dict with the
    surrogate, top-k influential components, and the instance's own score.
    """
    key = jax.random.PRNGKey(seed)
    x = jnp.asarray(instance)
    if mode == "feature":
        gen = lambda k: perturb_random_features_mean(x, k, n_changed=n_changed)
    elif mode == "time":
        gen = lambda k: perturb_segments(x, k, num_slices=num_slices, n_changed=n_changed)
    else:
        raise ValueError(f"unknown LIME mode {mode!r}")
    # ALL perturbations in one jitted vmap dispatch — an eager host loop
    # here costs one tunnel round-trip per jnp op per perturbation on
    # remote TPU runtimes (CLAUDE.md: never run repo jnp code eagerly)
    keys = jax.random.split(key, n_perturbations)
    batch, masks_dev = jax.jit(jax.vmap(gen))(keys)
    scores = np.asarray(scorer(batch))
    masks = np.asarray(masks_dev)
    weights = kernel_weights(masks)
    reg = fit_surrogate(masks, scores, weights)

    coefs = reg.coef_
    top = np.argsort(-np.abs(coefs))[:top_k]
    own_score = float(np.asarray(scorer(x[None]))[0])
    return {
        "surrogate": reg,
        "coefficients": coefs,
        "top_components": top.tolist(),
        "score": own_score,
        "label": int(own_score > 0.5),
        "masks": masks,
        "perturbation_scores": scores,
        "weights": weights,
    }


def lime_dataset(
    scorer: Callable,
    instances: np.ndarray,
    *,
    mode: str = "feature",
    num_slices: int = 9,
    n_changed: int = 4,
    seed: int = 0,
    save_path: str | None = None,
):
    """Dataset-level LIME (reference ``prepare_pertubation_data_GMM_BiLSTM``,
    reference/xai_func.py:38-176): perturb every instance once, re-score the
    perturbed set, fit one weighted surrogate over all masks."""
    key = jax.random.PRNGKey(seed)
    xs = jnp.asarray(np.stack([np.asarray(i) for i in instances]))
    if mode == "feature":
        gen = lambda xi, k: perturb_random_features_mean(xi, k, n_changed=n_changed)
    else:
        gen = lambda xi, k: perturb_segments(
            xi, k, num_slices=num_slices, n_changed=n_changed
        )
    # one jitted vmap over (instance, key) — see lime_single_instance
    keys = jax.random.split(key, len(instances))
    perturbed, masks_dev = jax.jit(jax.vmap(gen))(xs, keys)
    # invariant the reference asserts (reference/xai_func.py:91-92)
    assert perturbed.shape == xs.shape
    scores = np.asarray(scorer(perturbed))
    masks = np.asarray(masks_dev)
    weights = kernel_weights(masks)
    reg = fit_surrogate(masks, scores, weights)
    if save_path:
        import joblib

        joblib.dump(reg, save_path)
    return {"surrogate": reg, "masks": masks, "scores": scores, "weights": weights}
