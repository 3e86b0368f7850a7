"""MobileNet-MFCA, EDA variants, and plotting tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pandas as pd
from scipy.fftpack import dct as scipy_dct, idct as scipy_idct

from audioanalysisdetector_tpu.frontend.eda import compute_cqt_spec, melspectrogram_znorm, znorm
from audioanalysisdetector_tpu.models.mobilenet_mfca import (
    MFCAModule,
    MobileNetMFCA,
    dct_2d,
    idct_2d,
)
from audioanalysisdetector_tpu.utils.plotting import plot_coeff_histograms_by_label


def test_dct2d_matches_scipy(rng):
    x = rng.standard_normal((2, 3, 8, 6)).astype(np.float32)
    ours = np.asarray(dct_2d(jnp.asarray(x)))
    ref = scipy_dct(scipy_dct(x.astype(np.float64), axis=-1, norm="ortho"), axis=-2, norm="ortho")
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
    back = np.asarray(idct_2d(jnp.asarray(ours)))
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-5)


def test_dct_roundtrip_is_identity_on_1x1(rng):
    # the reference quirk: attention vector is (B, C, 1, 1) spatial
    y = jnp.asarray(rng.random((4, 16, 1, 1)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(idct_2d(dct_2d(y))), np.asarray(y), atol=1e-6)


def test_mfca_module(rng):
    m = MFCAModule()
    parts = [jnp.asarray(rng.standard_normal((2, 4, 4, 16)).astype(np.float32)) for _ in range(3)]
    v = m.init(jax.random.PRNGKey(0), *parts)
    out = m.apply(v, *parts)
    assert out.shape == (2, 4, 4, 48)


def test_mobilenet_mfca_forward_and_grad(rng):
    model = MobileNetMFCA()
    x = jnp.asarray(rng.standard_normal((2, 64, 64)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (2, 2)

    def loss(params):
        logits = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x, train=False
        )
        return -jnp.mean(jax.nn.log_softmax(logits)[:, 0])

    grads = jax.grad(loss)(v["params"])
    # DCT round trip must not block gradients (the reference's numpy detach did)
    mfca_grads = jax.tree_util.tree_leaves(grads["mfca"])
    assert any(float(jnp.abs(g).max()) > 0 for g in mfca_grads)


def test_compute_cqt_spec_contract(rng):
    y = jnp.asarray((rng.standard_normal((2, 32000)) * 0.1).astype(np.float32))
    out = np.asarray(compute_cqt_spec(y))
    assert out.shape == (2, 108, 63)
    np.testing.assert_allclose(out.mean(axis=(1, 2)), 0.0, atol=1e-4)
    np.testing.assert_allclose(out.std(axis=(1, 2)), 1.0, atol=1e-2)


def test_melspectrogram_znorm(rng):
    y = jnp.asarray((rng.standard_normal(32000) * 0.1).astype(np.float32))
    out = np.asarray(melspectrogram_znorm(y))
    assert out.shape == (128, 63)
    assert abs(out.mean()) < 1e-4


def test_znorm_batched(rng):
    x = jnp.asarray(rng.standard_normal((3, 5, 7)).astype(np.float32) * 10 + 4)
    out = np.asarray(znorm(x))
    np.testing.assert_allclose(out.mean(axis=(1, 2)), 0.0, atol=1e-5)


def test_plot_histograms(tmp_path, rng):
    df = pd.DataFrame(
        {
            "mfcc": [rng.standard_normal(4) for _ in range(10)],
            "label": ["spoof", "bonafide"] * 5,
        }
    )
    paths = plot_coeff_histograms_by_label(df, "mfcc", out_dir=str(tmp_path), max_coeffs=2)
    assert len(paths) == 2
    import os

    assert all(os.path.exists(p) for p in paths)


def test_mobilenet_trains_one_step(rng):
    """The notebook's train_loop_mfca role: MobileNetMFCA through the
    generic jitted train step."""
    from audioanalysisdetector_tpu.train import TrainState, get_loss, make_optimizer, make_train_step

    x = jnp.asarray(rng.standard_normal((4, 64, 64)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 2, 4))
    model = MobileNetMFCA()
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    state = TrainState.create(
        apply_fn=model.apply, params=v["params"],
        tx=make_optimizer("Adam", 1e-4), batch_stats=v["batch_stats"],
    )
    step = jax.jit(make_train_step(get_loss("CrossEntropyLoss")))
    state, m = step(state, x, y, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_mobilenet_features_match_published_param_count(rng):
    """Architecture cross-check against the published MobileNetV2 table
    (round-1 review Weak #7): torchvision's canonical mobilenet_v2 counts
    3,504,872 parameters (1000-class head) — features-only is therefore
    3,504,872 - (1280*1000 + 1000) = 2,223,872. Our trunk uses a 1-channel
    stem (the reference's mel input, ASV_deep_learning.ipynb cell 28), i.e.
    3*3*1*32 instead of 3*3*3*32 in the stem conv: 2,223,872 - 576 =
    2,223,296 parameters exactly (BatchNorm running stats are buffers in
    torch and batch_stats collections here — excluded on both sides)."""
    import jax
    from audioanalysisdetector_tpu.models.mobilenet_mfca import MobileNetV2Features
    from audioanalysisdetector_tpu.train.state import param_count

    model = MobileNetV2Features()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)), train=False
    )
    assert param_count(variables["params"]) == 2_223_296

    out = model.apply(variables, jnp.zeros((2, 64, 64, 1)), train=False)
    assert out.shape == (2, 2, 2, 1280)  # stride-32 trunk, 1280-ch final conv
