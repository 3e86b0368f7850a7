"""Loss zoo — the reference's criterion maps, jit-native.

The reference selects criteria by name in two places:
``BiLSTM_model``'s {CrossEntropyLoss, NLLLoss, MSELoss}
(reference/ASV_dl_func.py:1269-1274) and the ResNet sweep's
{CrossEntropyLoss, MSELoss, L1Loss} (reference/ASV_dl_func.py:945-953).
The flagship hybrid trains with BCE on sigmoid outputs
(ASV_deep_learning.ipynb cell 27) — provided here in the numerically stable
with-logits form.

All losses take ``(logits, labels)`` with integer labels and reduce to a
scalar mean. MSE/L1 compare softmax probabilities against one-hot targets
(the sensible reading of the reference's criterion sweep).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(logits, labels))


def nll(log_probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Expects log-probabilities (torch NLLLoss contract)."""
    return -jnp.mean(jnp.take_along_axis(log_probs, labels[:, None], axis=-1))


def mse_onehot(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    probs = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=probs.dtype)
    return jnp.mean((probs - onehot) ** 2)


def l1_onehot(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    probs = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=probs.dtype)
    return jnp.mean(jnp.abs(probs - onehot))


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Binary cross-entropy on a single-logit head; labels in {0, 1}."""
    logits = logits.reshape(logits.shape[0])
    labels = labels.astype(logits.dtype).reshape(labels.shape[0])
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))


LOSSES = {
    "CrossEntropyLoss": cross_entropy,
    "NLLLoss": nll,
    "MSELoss": mse_onehot,
    "L1Loss": l1_onehot,
    "BCELoss": bce_with_logits,
}


# per-row (unreduced) variants: mean(per_row) == the scalar loss above for
# every entry. Used where padded/duplicated rows must be masked out of the
# reduction (fit_bucketed's exact metrics and masked gradients).


def cross_entropy_per_row(logits, labels):
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels)


def nll_per_row(log_probs, labels):
    return -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]


def mse_onehot_per_row(logits, labels):
    probs = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=probs.dtype)
    return jnp.mean((probs - onehot) ** 2, axis=-1)


def l1_onehot_per_row(logits, labels):
    probs = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=probs.dtype)
    return jnp.mean(jnp.abs(probs - onehot), axis=-1)


def bce_with_logits_per_row(logits, labels):
    logits = logits.reshape(logits.shape[0])
    labels = labels.astype(logits.dtype).reshape(labels.shape[0])
    return optax.sigmoid_binary_cross_entropy(logits, labels)


LOSSES_PER_ROW = {
    "CrossEntropyLoss": cross_entropy_per_row,
    "NLLLoss": nll_per_row,
    "MSELoss": mse_onehot_per_row,
    "L1Loss": l1_onehot_per_row,
    "BCELoss": bce_with_logits_per_row,
}


def get_loss(name: str):
    if name not in LOSSES:
        raise ValueError(f"unknown loss {name!r}; available: {sorted(LOSSES)}")
    return LOSSES[name]


def get_loss_per_row(name: str):
    if name not in LOSSES_PER_ROW:
        raise ValueError(f"unknown loss {name!r}; available: {sorted(LOSSES_PER_ROW)}")
    return LOSSES_PER_ROW[name]
