"""2-D (data x model) component-sharded GMM scoring tests on the CPU mesh."""

import jax
import numpy as np
import jax.numpy as jnp

from audioanalysisdetector_tpu.models.gmm import DiagGMM, masked_llr
from audioanalysisdetector_tpu.parallel.sharded_gmm import (
    make_mesh_2d_for,
    make_sharded_masked_llr,
    shard_components,
)


def _rand_gmm(rng, k, d=7):
    return DiagGMM(
        weights=jnp.asarray(rng.dirichlet(np.ones(k)), jnp.float32),
        means=jnp.asarray(rng.standard_normal((k, d)), jnp.float32),
        variances=jnp.asarray(rng.random((k, d)) + 0.5, jnp.float32),
    )


def test_component_padding_is_neutral(rng):
    g = _rand_gmm(rng, k=5)
    padded = shard_components(g, 4)  # 5 -> 8 components
    assert padded.means.shape[0] == 8
    x = jnp.asarray(rng.standard_normal((10, 7)), jnp.float32)
    from audioanalysisdetector_tpu.models.gmm import score_samples

    np.testing.assert_allclose(
        np.asarray(score_samples(x, padded)), np.asarray(score_samples(x, g)),
        rtol=1e-5, atol=1e-5,
    )


def test_sharded_llr_matches_single_device(rng):
    mesh = make_mesh_2d_for(8, model=2)  # (4 data, 2 model)
    g1, g2 = _rand_gmm(rng, k=6), _rand_gmm(rng, k=6)
    x = rng.standard_normal((8, 12, 7)).astype(np.float32)
    x[3, 9:] = 0.0
    mask = x.sum(axis=-1) != 0
    ref = np.asarray(masked_llr(jnp.asarray(x), jnp.asarray(mask), g1, g2))
    fn = make_sharded_masked_llr(mesh, g1, g2)
    out = np.asarray(fn(jnp.asarray(x), jnp.asarray(mask)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_sharded_llr_4way_model_axis(rng):
    mesh = make_mesh_2d_for(8, model=4)  # (2 data, 4 model)
    g1, g2 = _rand_gmm(rng, k=10), _rand_gmm(rng, k=10)  # pads 10 -> 12
    x = rng.standard_normal((4, 5, 7)).astype(np.float32)
    mask = np.ones((4, 5), bool)
    ref = np.asarray(masked_llr(jnp.asarray(x), jnp.asarray(mask), g1, g2))
    fn = make_sharded_masked_llr(mesh, g1, g2)
    out = np.asarray(fn(jnp.asarray(x), jnp.asarray(mask)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_fit_em_frame_sharded_matches_single_device(rng):
    """EM over a frame-axis-sharded buffer (GSPMD data parallelism; no
    shard_map — the flat step is GEMMs + frame reductions that XLA
    partitions with automatic psums) must match the single-device fit."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from audioanalysisdetector_tpu.models.gmm import fit_em, map_adapt, score
    from audioanalysisdetector_tpu.parallel.mesh import make_mesh

    x = (rng.standard_normal((4096, 8)) * [1, 2, 1, 0.5, 1, 1, 2, 1]
         + rng.integers(-2, 3, (1, 8))).astype(np.float32)
    single = fit_em(x, 8, max_iter=40, seed=1)
    mesh = make_mesh(8)
    xd = jax.device_put(x, NamedSharding(mesh, P("data")))
    sharded = fit_em(xd, 8, max_iter=40, seed=1)
    np.testing.assert_allclose(
        np.asarray(single.weights), np.asarray(sharded.weights), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(single.means), np.asarray(sharded.means), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        float(score(jnp.asarray(x), single)), float(score(jnp.asarray(x), sharded)),
        rtol=1e-6,
    )
    # MAP adaptation accepts the same sharded buffer
    w = jnp.ones(len(x), jnp.float32)
    a = map_adapt(single, jnp.asarray(x), frame_weights=w)
    b = map_adapt(sharded, xd, frame_weights=jax.device_put(
        np.ones(len(x), np.float32), NamedSharding(mesh, P("data"))))
    np.testing.assert_allclose(np.asarray(a.means), np.asarray(b.means), rtol=1e-4, atol=1e-4)


def test_process_shard_single_host():
    from audioanalysisdetector_tpu.parallel.mesh import process_shard

    s = process_shard(100)
    assert (s.start, s.stop) == (0, 100)  # single-process identity
