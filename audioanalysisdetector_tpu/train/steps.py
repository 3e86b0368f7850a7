"""Jitted train / eval steps, single-chip and data-parallel (shard_map).

The reference's training loops move one batch at a time to a single device
(reference/ASV_dl_func.py:761-779, :1297-1330). Here a step is one compiled
function: forward + backward + optimizer update + metrics, with an optional
``axis_name`` under which gradients (and refreshed BatchNorm statistics) are
``pmean``-reduced across a device mesh — the TPU-native replacement for the
reference's absent data parallelism (SURVEY.md §2.6): collectives ride ICI,
the host never sees a gradient.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from audioanalysisdetector_tpu.train.state import TrainState


def make_train_step(
    loss_fn: Callable,
    *,
    axis_name: str | None = None,
    has_batch_stats: bool = True,
    binary_head: bool = False,
    augment_fn: Callable | None = None,
) -> Callable:
    """Build ``step(state, x, y, rng) -> (state, metrics)``.

    ``loss_fn(logits, labels)`` is any entry of the loss zoo. With
    ``axis_name`` the step is meant to run inside ``shard_map``; gradients,
    metrics, and updated BatchNorm stats are averaged over that axis.
    ``augment_fn(x, rng) -> x`` runs train-time augmentation (e.g.
    ``data.augment.spec_augment``) INSIDE the compiled step — BASELINE
    config #3's in-pipeline masking, zero extra dispatches.
    """

    def step(state: TrainState, x: jnp.ndarray, y: jnp.ndarray, rng: jax.Array):
        if axis_name is not None:
            # decorrelate dropout across data-parallel shards
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))

        if augment_fn is not None:
            rng, aug_rng = jax.random.split(rng)
            if isinstance(x, tuple):
                # one key PER BRANCH: a shared key would place identical
                # SpecAugment masks on same-shaped feature inputs, erasing
                # the same region from every branch at once
                keys = jax.random.split(aug_rng, len(x))
                x = tuple(augment_fn(xi, k) for xi, k in zip(x, keys))
            else:
                x = augment_fn(x, aug_rng)

        xs = x if isinstance(x, tuple) else (x,)  # multi-input models take tuples

        def compute_loss(params):
            if has_batch_stats:
                logits, new_model_state = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    *xs, train=True, rngs={"dropout": rng}, mutable=["batch_stats"],
                )
            else:
                logits = state.apply_fn(
                    {"params": params}, *xs, train=True, rngs={"dropout": rng}
                )
                new_model_state = {}
            return loss_fn(logits, y), (logits, new_model_state)

        (loss, (logits, new_model_state)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)

        if binary_head:
            preds = (logits.reshape(-1) > 0).astype(jnp.int32)
        else:
            preds = jnp.argmax(logits, axis=-1)
        acc = jnp.mean((preds == y).astype(jnp.float32))

        new_stats = new_model_state.get("batch_stats", state.batch_stats)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            acc = jax.lax.pmean(acc, axis_name)
            if has_batch_stats:
                new_stats = jax.lax.pmean(new_stats, axis_name)

        state = state.apply_gradients(grads, batch_stats=new_stats if has_batch_stats else None)
        return state, {"loss": loss, "accuracy": acc}

    return step


def make_eval_step(
    loss_fn: Callable, *, has_batch_stats: bool = True, binary_head: bool = False
) -> Callable:
    def step(state: TrainState, x: jnp.ndarray, y: jnp.ndarray):
        xs = x if isinstance(x, tuple) else (x,)
        variables = {"params": state.params}
        if has_batch_stats:
            variables["batch_stats"] = state.batch_stats
        logits = state.apply_fn(variables, *xs, train=False)
        loss = loss_fn(logits, y)
        if binary_head:
            preds = (logits.reshape(-1) > 0).astype(jnp.int32)
            scores = jax.nn.sigmoid(logits.reshape(-1))
        else:
            preds = jnp.argmax(logits, axis=-1)
            scores = jax.nn.softmax(logits, axis=-1)[..., 1]
        acc = jnp.mean((preds == y).astype(jnp.float32))
        return {"loss": loss, "accuracy": acc, "scores": scores, "preds": preds}

    return step


def make_dp_train_step(
    loss_fn: Callable,
    mesh: Mesh,
    *,
    axis: str = "data",
    has_batch_stats: bool = True,
    binary_head: bool = False,
    donate: bool = True,
) -> Callable:
    """Data-parallel step over ``mesh``: params replicated, batch sharded.

    Returns a jitted ``step(state, x, y, rng) -> (state, metrics)`` whose
    collectives (gradient/metric/BN pmean) run over ICI via ``shard_map``.
    """
    inner = make_train_step(
        loss_fn,
        axis_name=axis,
        has_batch_stats=has_batch_stats,
        binary_head=binary_head,
    )
    mapped = shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,) if donate else ())


def shard_batch(batch, mesh: Mesh, *, axis: str = "data"):
    """Device-put host arrays sharded along the batch axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(partial(jax.device_put, device=sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(partial(jax.device_put, device=sharding), tree)
