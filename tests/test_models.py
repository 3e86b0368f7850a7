"""Model-zoo tests: shapes, grads, and sklearn/torch cross-checks."""

import numpy as np
import jax
import jax.numpy as jnp
from sklearn.mixture import GaussianMixture

from audioanalysisdetector_tpu.models.bilstm_classifier import BiLSTMClassifier
from audioanalysisdetector_tpu.models.gmm import (
    DiagGMM,
    compute_llr,
    fit_em,
    map_adapt,
    masked_llr,
    predict_proba,
    score,
    score_samples,
)
from audioanalysisdetector_tpu.models.resnet import (
    AntiSpoofingResNet,
    MoreFeaturesClassifier,
)


def _sk_gmm_from(gmm_params):
    k, d = gmm_params.means.shape
    sk = GaussianMixture(n_components=k, covariance_type="diag")
    sk.weights_ = np.asarray(gmm_params.weights, dtype=np.float64)
    sk.means_ = np.asarray(gmm_params.means, dtype=np.float64)
    sk.covariances_ = np.asarray(gmm_params.variances, dtype=np.float64)
    sk.precisions_cholesky_ = 1.0 / np.sqrt(sk.covariances_)
    return sk


def _rand_gmm(rng, k=5, d=3):
    return DiagGMM(
        weights=jnp.asarray(np.full(k, 1 / k), jnp.float32),
        means=jnp.asarray(rng.standard_normal((k, d)), jnp.float32),
        variances=jnp.asarray(rng.random((k, d)) + 0.5, jnp.float32),
    )


def test_gmm_score_matches_sklearn(rng):
    gmm = _rand_gmm(rng)
    sk = _sk_gmm_from(gmm)
    x = rng.standard_normal((100, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(score_samples(jnp.asarray(x), gmm)),
        sk.score_samples(x),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        float(score(jnp.asarray(x), gmm)), sk.score(x), rtol=1e-5, atol=1e-5
    )


def test_gmm_predict_proba_matches_sklearn(rng):
    gmm = _rand_gmm(rng)
    sk = _sk_gmm_from(gmm)
    x = rng.standard_normal((50, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(predict_proba(jnp.asarray(x), gmm)),
        sk.predict_proba(x),
        rtol=1e-3, atol=1e-5,
    )


def test_llr_matches_reference_formula(rng):
    g1, g2 = _rand_gmm(rng), _rand_gmm(rng, k=4)
    sk1, sk2 = _sk_gmm_from(g1), _sk_gmm_from(g2)
    x = rng.standard_normal((64, 3)).astype(np.float32)
    ours = float(compute_llr(jnp.asarray(x), g1, g2))
    ref = sk1.score(x) - sk2.score(x)  # reference/ASV_dl_func.py:1200-1203
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_masked_llr_equals_unpadded(rng):
    g1, g2 = _rand_gmm(rng), _rand_gmm(rng)
    x = rng.standard_normal((40, 3)).astype(np.float32)
    pad = np.zeros((23, 3), dtype=np.float32)
    x_pad = np.concatenate([x, pad])
    mask = np.concatenate([np.ones(40, bool), np.zeros(23, bool)])
    full = float(compute_llr(jnp.asarray(x), g1, g2))
    masked = float(masked_llr(jnp.asarray(x_pad), jnp.asarray(mask), g1, g2))
    np.testing.assert_allclose(masked, full, rtol=1e-5, atol=1e-5)


def test_em_recovers_synthetic_mixture(rng):
    n = 20000
    comp = rng.random(n) < 0.3
    x = np.where(
        comp[:, None],
        rng.normal(loc=(-3.0, 2.0), scale=0.5, size=(n, 2)),
        rng.normal(loc=(2.0, -1.0), scale=1.0, size=(n, 2)),
    ).astype(np.float32)
    gmm = fit_em(x, n_components=2, max_iter=50, chunk=4096, seed=0)
    w = np.sort(np.asarray(gmm.weights))
    np.testing.assert_allclose(w, [0.3, 0.7], atol=0.02)
    means = np.asarray(gmm.means)
    order = np.argsort(means[:, 0])
    np.testing.assert_allclose(means[order], [[-3.0, 2.0], [2.0, -1.0]], atol=0.1)


def test_em_likelihood_close_to_sklearn(rng):
    x = rng.standard_normal((5000, 4)).astype(np.float32) * [1, 2, 0.5, 1] + [0, 3, -1, 0]
    ours = fit_em(x, n_components=8, max_iter=60, chunk=1024, seed=1)
    sk = GaussianMixture(8, covariance_type="diag", max_iter=60, random_state=1).fit(x)
    ll_ours = float(score(jnp.asarray(x), ours))
    ll_sk = sk.score(x)
    assert ll_ours > ll_sk - 0.05, (ll_ours, ll_sk)


def test_map_adapt_matches_reference_equations(rng):
    """Element-wise parity with the reference's update math
    (reference/ASV_dl_func.py:1178-1196), computed independently in numpy."""
    ubm = _rand_gmm(rng, k=6, d=4)
    sk = _sk_gmm_from(ubm)
    x = rng.standard_normal((500, 4)).astype(np.float32)
    ours = map_adapt(ubm, jnp.asarray(x), relevance_factor=10.0)

    resp = sk.predict_proba(x)
    nk = resp.sum(0) + 1e-6
    fk = resp.T @ x
    alpha = nk / (nk + 10.0)
    new_means = alpha[:, None] * (fk / nk[:, None]) + (1 - alpha[:, None]) * sk.means_
    sk_2 = resp.T @ (x**2)
    new_vars = alpha[:, None] * (sk_2 / nk[:, None] - new_means**2) + (
        1 - alpha[:, None]
    ) * sk.covariances_
    new_vars = np.maximum(new_vars, 1e-6)
    new_w = alpha * (nk / nk.sum()) + (1 - alpha) * sk.weights_
    new_w /= new_w.sum()

    np.testing.assert_allclose(np.asarray(ours.means), new_means, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours.variances), new_vars, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours.weights), new_w, rtol=1e-3, atol=1e-6)


def test_map_adapt_means_only(rng):
    """Reynolds-style means-only mode: means move, variances and weights
    stay at the UBM's exactly (the flagship default; see gmm.map_adapt)."""
    ubm = _rand_gmm(rng, k=6, d=4)
    x = rng.standard_normal((500, 4)).astype(np.float32) + 0.5
    full = map_adapt(ubm, jnp.asarray(x))
    mo = map_adapt(ubm, jnp.asarray(x), adapt_vars=False, adapt_weights=False)
    np.testing.assert_array_equal(np.asarray(mo.variances), np.asarray(ubm.variances))
    np.testing.assert_array_equal(np.asarray(mo.weights), np.asarray(ubm.weights))
    np.testing.assert_allclose(np.asarray(mo.means), np.asarray(full.means), atol=1e-6)
    assert np.abs(np.asarray(mo.means) - np.asarray(ubm.means)).max() > 1e-3


def test_fit_em_var_floor_rel(rng):
    """A cluster of near-duplicate frames must not collapse a component's
    variance below the relative floor (collapse inflates every LLR)."""
    base = rng.standard_normal((2000, 3)).astype(np.float32)
    dupes = np.repeat(rng.standard_normal((1, 3)).astype(np.float32), 300, axis=0)
    x = np.concatenate([base, dupes + 1e-5 * rng.standard_normal((300, 3)).astype(np.float32)])
    floored = fit_em(x, n_components=8, max_iter=50, seed=0, var_floor_rel=1e-3)
    floor = 1e-3 * x.var(axis=0)
    assert (np.asarray(floored.variances) >= floor - 1e-9).all()
    plain = fit_em(x, n_components=8, max_iter=50, seed=0)
    assert np.asarray(plain.variances).min() < np.asarray(floored.variances).min()


def test_bilstm_classifier_shapes_and_grads(rng):
    model = BiLSTMClassifier(hidden=16)
    x = jnp.asarray(rng.standard_normal((4, 63, 19)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (4, 2)

    def loss(params):
        logits = model.apply({"params": params}, x, train=False)
        return jnp.mean(jax.nn.log_softmax(logits)[:, 0] * -1)

    grads = jax.grad(loss)(v["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_bilstm_classifier_lengths_readout(rng):
    model = BiLSTMClassifier(hidden=8)
    x = rng.standard_normal((2, 10, 5)).astype(np.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    # sequence 0 true length 6: readout at index 5 must equal running the
    # truncated-but-repadded sequence with the same length
    lengths = jnp.asarray([6, 10])
    out = model.apply(v, jnp.asarray(x), train=False, lengths=lengths)
    x_trunc = x.copy()
    out2 = model.apply(v, jnp.asarray(x_trunc), train=False, lengths=lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)
    assert out.shape == (2, 2)


def test_antispoofing_resnet_shapes(rng):
    model = AntiSpoofingResNet()
    x = jnp.asarray(rng.standard_normal((2, 19, 63)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (2, 2)
    # works on a different feature-map geometry too (mel 64x63)
    x2 = jnp.asarray(rng.standard_normal((2, 64, 63)).astype(np.float32))
    v2 = model.init(jax.random.PRNGKey(0), x2, train=False)
    assert model.apply(v2, x2, train=False).shape == (2, 2)


def test_resnet_train_mode_updates_batch_stats(rng):
    model = AntiSpoofingResNet()
    x = jnp.asarray(rng.standard_normal((4, 19, 63)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out, mutated = model.apply(
        v, x, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert out.shape == (4, 2)
    before = jax.tree_util.tree_leaves(v["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_more_features_classifier(rng):
    model = MoreFeaturesClassifier()
    xs = [jnp.asarray(rng.standard_normal((2, 19, 63)).astype(np.float32)) for _ in range(3)]
    v = model.init(jax.random.PRNGKey(0), *xs, train=False)
    out = model.apply(v, *xs, train=False)
    assert out.shape == (2, 2)
    # one shared trunk: only one 'extractor' param subtree
    assert set(v["params"].keys()) == {"extractor", "fc1", "fc2", "fc3"}


def test_fit_em_device_side_convergence_semantics(rng):
    """The blocked on-device convergence test must stop at EXACTLY the same
    state as a per-iteration host test: with a huge tol, EM converges after
    the 2nd iteration and the carry freezes for the rest of the block."""
    x = rng.standard_normal((2000, 4)).astype(np.float32)
    stopped = fit_em(x, n_components=4, max_iter=50, tol=1e9, chunk=512, seed=0)
    two_iter = fit_em(x, n_components=4, max_iter=2, tol=0.0, chunk=512, seed=0)
    np.testing.assert_allclose(
        np.asarray(stopped.means), np.asarray(two_iter.means), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(stopped.weights), np.asarray(two_iter.weights), rtol=1e-6
    )


def test_map_adapt_frame_weights_equals_subset(rng):
    """MAP with a 0/1 frame-weight mask over a shared buffer must equal MAP
    on the sliced subset — the single-upload training path relies on it."""
    ubm = _rand_gmm(rng, k=5, d=3)
    x = rng.standard_normal((400, 3)).astype(np.float32)
    mask = (rng.random(400) < 0.4).astype(np.float32)
    weighted = map_adapt(ubm, jnp.asarray(x), frame_weights=jnp.asarray(mask))
    subset = map_adapt(ubm, jnp.asarray(x[mask.astype(bool)]))
    np.testing.assert_allclose(np.asarray(weighted.means), np.asarray(subset.means), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(weighted.variances), np.asarray(subset.variances), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(weighted.weights), np.asarray(subset.weights), rtol=1e-5, atol=1e-7)


def test_fit_em_device_input_matches_host_input(rng):
    """fit_em on a device-resident jax.Array (the single-upload path) must
    reproduce the host-array fit — same seed, same rng sequence; only the
    initial-variance reduction order (jnp.var vs np.var) injects fp noise."""
    import jax

    x = rng.standard_normal((2500, 4)).astype(np.float32)
    host = fit_em(x, n_components=3, max_iter=15, seed=7)
    dev = fit_em(jax.device_put(x), n_components=3, max_iter=15, seed=7)
    np.testing.assert_allclose(np.asarray(host.means), np.asarray(dev.means), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(host.variances), np.asarray(dev.variances), rtol=1e-3, atol=1e-5)


def test_fit_em_flat_matches_chunked(rng):
    """The flat (responsibilities-materialized) EM path used for HBM-sized
    fits must agree with the chunked lax.scan fallback — same math, different
    accumulation order, so only fp tolerance separates them."""
    x = rng.standard_normal((3000, 5)).astype(np.float32) * [1, 2, 0.5, 1, 3]
    flat = fit_em(x, n_components=6, max_iter=20, tol=0.0, seed=3)
    chunked = fit_em(x, n_components=6, max_iter=20, tol=0.0, seed=3, flat_bytes=0, chunk=512)
    np.testing.assert_allclose(np.asarray(flat.means), np.asarray(chunked.means), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(flat.variances), np.asarray(chunked.variances), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(flat.weights), np.asarray(chunked.weights), rtol=2e-4, atol=2e-5)


def test_map_adapt_chunked_matches_flat(rng):
    """The chunked-scan MAP (for larger-than-HBM frame buffers) must equal
    the flat path up to summation order, in both adapt modes."""
    from audioanalysisdetector_tpu.models.gmm import map_adapt_chunked

    ubm = _rand_gmm(rng, k=6, d=4)
    x = rng.standard_normal((777, 4)).astype(np.float32)  # non-multiple of chunk
    w = (rng.random(777) < 0.6).astype(np.float32)
    for full in (True, False):
        flat = map_adapt(
            ubm, jnp.asarray(x), frame_weights=jnp.asarray(w),
            adapt_vars=full, adapt_weights=full,
        )
        chunked = map_adapt_chunked(
            ubm, jnp.asarray(x), chunk=128, frame_weights=jnp.asarray(w),
            adapt_vars=full, adapt_weights=full,
        )
        np.testing.assert_allclose(
            np.asarray(chunked.means), np.asarray(flat.means), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(chunked.variances), np.asarray(flat.variances), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(chunked.weights), np.asarray(flat.weights), rtol=1e-5, atol=1e-7
        )


def test_per_row_losses_mean_to_scalar(rng):
    """mean(per_row loss) must equal the scalar loss for every zoo entry —
    fit_bucketed's masked metrics rely on the equivalence."""
    import jax

    from audioanalysisdetector_tpu.train.losses import LOSSES, LOSSES_PER_ROW

    labels = jnp.asarray(rng.integers(0, 2, 16))
    for name in LOSSES:
        if name == "BCELoss":
            logits = jnp.asarray(rng.standard_normal((16, 1)).astype(np.float32))
        elif name == "NLLLoss":
            logits = jax.nn.log_softmax(
                jnp.asarray(rng.standard_normal((16, 2)).astype(np.float32))
            )
        else:
            logits = jnp.asarray(rng.standard_normal((16, 2)).astype(np.float32))
        per_row = LOSSES_PER_ROW[name](logits, labels)
        assert per_row.shape == (16,), name
        np.testing.assert_allclose(
            float(jnp.mean(per_row)), float(LOSSES[name](logits, labels)),
            rtol=1e-6, err_msg=name,
        )
