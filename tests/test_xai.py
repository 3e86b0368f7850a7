"""XAI tests: attribution axioms, localization sanity, LIME/SHAP mechanics."""

import numpy as np
import jax
import jax.numpy as jnp

from audioanalysisdetector_tpu.models.bilstm_classifier import BiLSTMClassifier
from audioanalysisdetector_tpu.models.gmm import DiagGMM, masked_llr
from audioanalysisdetector_tpu.models.resnet import AntiSpoofingResNet
from audioanalysisdetector_tpu.xai import (
    compare_gmm_bilstm,
    extract_top_intervals_global,
    gmm_shap,
    grad_cam,
    integrated_gradients,
    kernel_weights,
    lime_dataset,
    lime_single_instance,
    occlusion,
    perturb_random_features_mean,
    perturb_segments,
    saliency,
)


def _linear_apply(variables, x, train=False):
    """A transparent 'model': score = sum(W * x), for axiom checks."""
    w = variables["params"]["w"]
    return jnp.sum(x * w, axis=(-1, -2))[:, None]


def test_ig_completeness_on_linear_model(rng):
    # for a linear model, IG == input * weight exactly, regardless of steps
    w = rng.standard_normal((6, 7)).astype(np.float32)
    x = rng.standard_normal((2, 6, 7)).astype(np.float32)
    variables = {"params": {"w": jnp.asarray(w)}}
    ig = np.asarray(
        integrated_gradients(_linear_apply, variables, jnp.asarray(x), steps=8)
    )
    np.testing.assert_allclose(ig, x * w, rtol=1e-4, atol=1e-5)
    # completeness: sum(IG) == f(x) - f(0)
    np.testing.assert_allclose(ig.sum(axis=(1, 2)), (x * w).sum(axis=(1, 2)), rtol=1e-4)


def test_saliency_matches_abs_weight_on_linear_model(rng):
    w = rng.standard_normal((4, 5)).astype(np.float32)
    x = rng.standard_normal((1, 4, 5)).astype(np.float32)
    variables = {"params": {"w": jnp.asarray(w)}}
    s = np.asarray(saliency(_linear_apply, variables, jnp.asarray(x)))
    np.testing.assert_allclose(s[0], np.abs(w), rtol=1e-5)


def test_occlusion_localizes_on_linear_model(rng):
    # weight concentrated on one cell: occlusion heat must peak there
    w = np.zeros((9, 5), np.float32)
    w[4, 2] = 3.0
    x = np.ones((1, 9, 5), np.float32)
    variables = {"params": {"w": jnp.asarray(w)}}
    heat = np.asarray(
        occlusion(_linear_apply, variables, jnp.asarray(x), window=(3, 1))
    )[0]
    assert np.unravel_index(np.argmax(heat), heat.shape) == (4, 2)


def test_bilstm_ig_runs_on_real_model(rng):
    model = BiLSTMClassifier(hidden=8)
    x = jnp.asarray(rng.standard_normal((2, 12, 5)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    ig = integrated_gradients(model.apply, v, x, steps=8)
    assert ig.shape == x.shape and np.isfinite(np.asarray(ig)).all()


def test_grad_cam_shape_and_nonnegativity(rng):
    model = AntiSpoofingResNet()
    x = jnp.asarray(rng.standard_normal((2, 19, 63)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    cam = np.asarray(grad_cam(model, v, x, output_size=(19, 63)))
    assert cam.shape == (2, 19, 63)
    assert (cam >= 0).all() and np.isfinite(cam).all()


def test_perturb_feature_rows(rng):
    x = jnp.asarray(rng.standard_normal((19, 63)).astype(np.float32))
    p, mask = perturb_random_features_mean(x, jax.random.PRNGKey(0), n_changed=4)
    assert p.shape == x.shape and mask.shape == (19,)
    assert int((mask == 0).sum()) == 4
    changed = np.where(np.asarray(mask) == 0)[0]
    for r in changed:
        np.testing.assert_allclose(np.asarray(p)[r], np.asarray(x)[r].mean(), atol=1e-5)
    kept = np.where(np.asarray(mask) == 1)[0]
    np.testing.assert_array_equal(np.asarray(p)[kept], np.asarray(x)[kept])


def test_perturb_segments(rng):
    x = jnp.asarray(rng.standard_normal((19, 63)).astype(np.float32))
    p, mask = perturb_segments(x, jax.random.PRNGKey(1), num_slices=9, n_changed=3)
    assert mask.shape == (9,) and int((np.asarray(mask) == 0).sum()) == 3


def test_kernel_weights_monotone():
    # masks closer to all-ones get larger weights
    masks = np.array([[1, 1, 1, 1], [1, 1, 1, 0], [1, 0, 0, 0]], dtype=float)
    w = kernel_weights(masks)
    assert w[0] > w[1] > w[2]


def _toy_scorer(rng):
    """Scorer whose output depends only on coefficient row 3."""
    w = np.zeros((19, 63), np.float32)
    w[3] = 0.3

    def scorer(batch):  # (B, 19, 63) -> (B,)
        return jax.nn.sigmoid(jnp.sum(batch * w, axis=(-1, -2)))

    return scorer


def test_lime_single_instance_finds_influential_row(rng):
    scorer = _toy_scorer(rng)
    inst = rng.standard_normal((19, 63)).astype(np.float32)
    inst[3] += 1.0
    out = lime_single_instance(scorer, inst, n_perturbations=64, n_changed=4, seed=1)
    assert 3 in out["top_components"]
    assert out["score"] == out["perturbation_scores"].dtype.type(out["score"])


def test_lime_dataset_persists(tmp_path, rng):
    scorer = _toy_scorer(rng)
    insts = rng.standard_normal((8, 19, 63)).astype(np.float32)
    path = str(tmp_path / "lime_regression_feature_slice_9.pkl")
    out = lime_dataset(scorer, insts, save_path=path)
    assert out["masks"].shape == (8, 19)
    import os

    assert os.path.exists(path)


def test_gmm_shap_heatmap(rng):
    g1 = DiagGMM(
        weights=jnp.asarray([1.0]), means=jnp.zeros((1, 19)), variances=jnp.ones((1, 19))
    )
    g2 = DiagGMM(
        weights=jnp.asarray([1.0]),
        means=jnp.full((1, 19), 2.0),
        variances=jnp.ones((1, 19)),
    )

    def score_fn(batch):  # (B, T, F) -> sigmoid LLR
        mask = jnp.ones(batch.shape[:-1], bool)
        return jax.nn.sigmoid(masked_llr(batch, mask, g1, g2))

    inst = rng.standard_normal((63, 19)).astype(np.float32)
    heat = gmm_shap(score_fn, inst, n_coalitions=64, seed=0)
    assert heat.shape == (63, 19)
    assert np.isfinite(heat).all()


def test_compare_and_intervals(rng):
    model = BiLSTMClassifier(hidden=8)
    x0 = rng.standard_normal((63, 19)).astype(np.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(x0)[None], train=False)
    g1 = DiagGMM(
        weights=jnp.asarray([1.0]), means=jnp.zeros((1, 19)), variances=jnp.ones((1, 19))
    )
    g2 = DiagGMM(
        weights=jnp.asarray([1.0]), means=jnp.ones((1, 19)), variances=jnp.ones((1, 19))
    )

    def gmm_score(batch):
        mask = jnp.ones(batch.shape[:-1], bool)
        return jax.nn.sigmoid(masked_llr(batch, mask, g1, g2))

    out = compare_gmm_bilstm(
        x0, bilstm_apply=model.apply, bilstm_variables=v,
        gmm_score_fn=gmm_score, ig_steps=4, shap_coalitions=32,
    )
    assert set(out["heatmaps"]) == {"gmm_shap", "bilstm_ig", "bilstm_occlusion"}
    assert out["heatmaps"]["gmm_shap"].shape == (63, 19)

    # interval extraction on a synthetic saliency track
    hm = np.zeros((63, 19))
    hm[10:25] = 0.5  # 15 frames * 32 ms = 0.48 s, above min duration
    hm[40:43] = 0.9  # 3 frames = 0.096 s, below min duration -> dropped
    iv = extract_top_intervals_global(hm, top_n=3)
    assert len(iv) == 1
    start, end, sal = iv[0]
    assert abs(start - 10 * 512 / 16000) < 1e-6 and abs(end - 25 * 512 / 16000) < 1e-6


def test_gmm_shap_matches_brute_force_shapley(rng):
    """Exact-Shapley cross-check (round-1 review Weak #7): on instances small
    enough to enumerate, the kernel-SHAP window attributions must equal the
    brute-force Shapley values of the same coalition game to numerical
    precision (reference/tets_xai.py:28-67 defines the game: masked-out
    windows are background-substituted, value = scored probability)."""
    from itertools import combinations
    from math import factorial

    from audioanalysisdetector_tpu.xai.shap_gmm import time_windows

    k, d = 4, 5
    g1 = DiagGMM(
        weights=jnp.full((k,), 1 / k),
        means=jnp.asarray(rng.standard_normal((k, d)), jnp.float32),
        variances=jnp.ones((k, d)) * 1.2,
    )
    g2 = DiagGMM(
        weights=jnp.full((k,), 1 / k),
        means=jnp.asarray(rng.standard_normal((k, d)), jnp.float32),
        variances=jnp.ones((k, d)) * 0.7,
    )

    def score_fn(batch):
        mask = jnp.ones(batch.shape[:2], bool)
        return jax.nn.sigmoid(masked_llr(batch, mask, g1, g2))

    for T, size, stride in ((6, 4, 2), (8, 4, 2)):  # M = 2 and M = 3 windows
        x = rng.standard_normal((T, d)).astype(np.float32)
        background = np.broadcast_to(x.mean(axis=0, keepdims=True), x.shape)
        windows = time_windows(T, size=size, stride=stride)
        M = len(windows)

        def v(z):
            keep = np.ones(T, dtype=bool)
            for m, (lo, hi) in enumerate(windows):
                if z[m] == 0:
                    keep[lo:hi] = False
            inst = np.where(keep[:, None], x, background).astype(np.float32)
            return float(score_fn(jnp.asarray(inst[None]))[0])

        phi_exact = np.zeros(M)
        for m in range(M):
            others = [j for j in range(M) if j != m]
            for r in range(M):
                for S in combinations(others, r):
                    wgt = factorial(r) * factorial(M - 1 - r) / factorial(M)
                    z0 = np.zeros(M)
                    z0[list(S)] = 1
                    z1 = z0.copy()
                    z1[m] = 1
                    phi_exact[m] += wgt * (v(z1) - v(z0))

        heat = gmm_shap(score_fn, x, window_size=size, stride=stride, n_coalitions=256)

        # rebuild the expected heatmap from the exact window values with the
        # same uniform-spread / overlap-average rule
        exp = np.zeros((T, d))
        counts = np.zeros((T, 1))
        for m, (lo, hi) in enumerate(windows):
            exp[lo:hi] += phi_exact[m] / (hi - lo) / d
            counts[lo:hi] += 1
        exp = exp / np.maximum(counts, 1.0)
        np.testing.assert_allclose(heat, exp, rtol=1e-4, atol=1e-7)
