"""Component-sharded GMM scoring — a model-parallel axis over ICI.

The framework's neural models are small enough that pure data parallelism is
optimal (SURVEY.md §2.6), but the GMM subsystem scales in its *component*
dimension (the reference uses 128; forensic UBMs go to 2048+). This module
shards mixture components across a ``model`` mesh axis while the batch
shards across ``data`` — a 2-D decomposition where the only cross-device
communication is the component-axis logsumexp:

  global logsumexp_K = m + log(psum_model(sum_local exp(lw - m))),
  m = pmax_model(max_local lw)

Both collectives ride ICI; per-frame traffic is two scalars per frame
regardless of K.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from audioanalysisdetector_tpu.models.gmm import DiagGMM, log_weighted


def shard_components(gmm: DiagGMM, n_shards: int) -> DiagGMM:
    """Pad K to a multiple of ``n_shards`` with -inf-weight dummy components.

    Dummy components have weight 0 (log weight -inf) so they never contribute
    to the logsumexp; variances are 1 to keep densities finite.
    """
    k, d = gmm.means.shape
    k_pad = -(-k // n_shards) * n_shards
    if k_pad == k:
        return gmm
    pad = k_pad - k
    return DiagGMM(
        weights=jnp.concatenate([gmm.weights, jnp.zeros(pad, gmm.weights.dtype)]),
        means=jnp.concatenate([gmm.means, jnp.zeros((pad, d), gmm.means.dtype)]),
        variances=jnp.concatenate([gmm.variances, jnp.ones((pad, d), gmm.variances.dtype)]),
    )


def _sharded_score_samples(x: jnp.ndarray, gmm: DiagGMM, axis: str) -> jnp.ndarray:
    """Per-frame log-likelihood with components sharded over ``axis``."""
    lw = log_weighted(x, gmm)  # (..., K_local); -inf for dummy components
    local_max = jnp.max(lw, axis=-1)
    m = jax.lax.pmax(local_max, axis)
    local_sum = jnp.sum(jnp.exp(lw - m[..., None]), axis=-1)
    total = jax.lax.psum(local_sum, axis)
    return m + jnp.log(total)


def make_sharded_masked_llr(
    mesh: Mesh,
    gmm1: DiagGMM,
    gmm2: DiagGMM,
    *,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """Jitted ``(x (B,T,D), mask (B,T)) -> llr (B,)`` on a 2-D mesh.

    Batch shards over ``data_axis``; both GMMs' components shard over
    ``model_axis`` (replicated along data). Matches
    ``models.gmm.masked_llr`` numerically.
    """
    n_model = mesh.shape[model_axis]
    g1 = shard_components(gmm1, n_model)
    g2 = shard_components(gmm2, n_model)

    def score(x, mask, g1, g2):
        diff = _sharded_score_samples(x, g1, model_axis) - _sharded_score_samples(
            x, g2, model_axis
        )
        m = mask.astype(diff.dtype)
        denom = jnp.maximum(jnp.sum(m, axis=-1), 1.0)
        return jnp.sum(diff * m, axis=-1) / denom

    gmm_specs = DiagGMM(
        weights=P(model_axis), means=P(model_axis, None), variances=P(model_axis, None)
    )
    mapped = shard_map(
        score,
        mesh=mesh,
        in_specs=(P(data_axis), P(data_axis), gmm_specs, gmm_specs),
        out_specs=P(data_axis),
        check_vma=False,
    )
    jitted = jax.jit(mapped)
    return lambda x, mask: jitted(x, mask, g1, g2)  # shard_map wants positional args


def make_mesh_2d_for(n_devices: int | None = None, model: int = 2) -> Mesh:
    """Convenience (data, model) mesh over the available devices."""
    from audioanalysisdetector_tpu.parallel.mesh import make_mesh_2d

    n = len(jax.devices()) if n_devices is None else n_devices
    if n % model:
        raise ValueError(f"{n} devices not divisible by model={model}")
    return make_mesh_2d(n // model, model)
