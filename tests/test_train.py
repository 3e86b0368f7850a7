"""Training subsystem tests: metrics vs sklearn, steps, DP parity, loops."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from sklearn.metrics import accuracy_score, f1_score, roc_curve

from audioanalysisdetector_tpu.models.cnn_bilstm import CNNBiLSTMHybrid
from audioanalysisdetector_tpu.parallel.mesh import make_mesh
from audioanalysisdetector_tpu.train import (
    TrainState,
    accuracy,
    bilstm_pipeline,
    eer,
    eer_jnp,
    evaluate,
    f1_binary,
    fit,
    get_loss,
    make_dp_train_step,
    make_optimizer,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)


def test_metrics_match_sklearn(rng):
    y_true = rng.integers(0, 2, 500)
    y_pred = rng.integers(0, 2, 500)
    scores = rng.random(500)
    assert accuracy(y_true, y_pred) == accuracy_score(y_true, y_pred)
    assert np.isclose(f1_binary(y_true, y_pred), f1_score(y_true, y_pred))
    fpr, tpr, _ = roc_curve(y_true, scores, pos_label=1)
    fnr = 1 - tpr
    ref_eer = fpr[np.nanargmin(np.abs(fnr - fpr))]  # reference/ASV_dl_func.py:1503-1506
    assert np.isclose(eer(y_true, scores), ref_eer)


def test_eer_jnp_matches_host(rng):
    y = rng.integers(0, 2, 300)
    s = rng.random(300)
    host = eer(y, s)
    dev = float(eer_jnp(jnp.asarray(y), jnp.asarray(s)))
    assert abs(host - dev) < 2e-2  # threshold-set granularity differs slightly


def test_eer_separable():
    y = np.array([0] * 50 + [1] * 50)
    s = np.concatenate([np.random.default_rng(0).random(50) * 0.4, 0.6 + np.random.default_rng(1).random(50) * 0.4])
    assert eer(y, s) == 0.0


def _toy_data(rng, n=128):
    x = rng.standard_normal((n, 19, 63)).astype(np.float32)
    y = (x.mean(axis=(1, 2)) > 0).astype(np.int64)
    x[y == 1] += 0.5  # make the classes separable
    return x, y


def _make_state(model, x, seed=0, lr=1e-3):
    variables = model.init(jax.random.PRNGKey(seed), jnp.asarray(x[:2]), train=False)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=make_optimizer("Adam", lr),
        batch_stats=variables.get("batch_stats", {}),
    )


def test_train_step_reduces_loss(rng):
    x, y = _toy_data(rng)
    model = CNNBiLSTMHybrid(fixed_attention=True, logits=True)
    state = _make_state(model, x)
    step = jax.jit(make_train_step(get_loss("BCELoss"), has_batch_stats=True, binary_head=True))
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        state, m = step(state, x, y, sub)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses[::10]


def test_dp_step_matches_single_device(rng):
    """Data-parallel (8 virtual CPU devices) must match single-device math."""
    x, y = _toy_data(rng, n=64)
    model = CNNBiLSTMHybrid(fixed_attention=True, logits=True, conv_dropout=0.0, dropout_rate=0.0)
    state_a = _make_state(model, x)
    # DP twin with sync-BN over the mesh axis so normalization is global
    model_dp = CNNBiLSTMHybrid(
        fixed_attention=True, logits=True, conv_dropout=0.0, dropout_rate=0.0,
        bn_axis_name="data",
    )
    state_b = jax.tree_util.tree_map(lambda v: v.copy(), state_a)
    state_b = state_b.replace(apply_fn=model_dp.apply)

    single = jax.jit(make_train_step(get_loss("BCELoss"), binary_head=True))
    mesh = make_mesh(8)
    dp = make_dp_train_step(get_loss("BCELoss"), mesh, binary_head=True, donate=False)

    key = jax.random.PRNGKey(1)
    for i in range(3):
        key, sub = jax.random.split(key)
        state_a, ma = single(state_a, x, y, sub)
        state_b, mb = dp(state_b, x, y, sub)
    # dropout disabled -> identical math up to reduction order (Adam's
    # 1/sqrt(v) amplifies float noise on near-zero-gradient params, hence atol)
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-4)
    for pa, pb in zip(
        jax.tree_util.tree_leaves(state_a.params), jax.tree_util.tree_leaves(state_b.params)
    ):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-2, atol=1e-4)


def test_fit_dp_matches_single_device(rng, tmp_path):
    """``fit(data_parallel=True)`` over the 8-virtual-device CPU mesh must
    match the single-device run numerically (dropout off; sync-BN twin so
    normalization is global — round-2 review Next #3)."""
    x, y = _toy_data(rng, n=64)
    kw = dict(fixed_attention=True, logits=True, conv_dropout=0.0, dropout_rate=0.0)
    model_sd = CNNBiLSTMHybrid(**kw)
    model_dp = CNNBiLSTMHybrid(**kw, bn_axis_name="data")
    state_sd = _make_state(model_sd, x)
    state_dp = jax.tree_util.tree_map(lambda v: v.copy(), state_sd)
    state_dp = state_dp.replace(apply_fn=model_dp.apply)

    common = dict(loss_name="BCELoss", num_epochs=2, batch_size=32,
                  binary_head=True, plots=False, seed=3)
    res_sd = fit(state_sd, (x, y), (x, y), data_parallel=False, **common)
    res_dp = fit(state_dp, (x, y), (x, y), data_parallel=True, **common)
    for a, b in zip(res_sd.logs, res_dp.logs):
        np.testing.assert_allclose(a.train_loss, b.train_loss, rtol=1e-4)
        np.testing.assert_allclose(a.val_loss, b.val_loss, rtol=1e-4)
    for pa, pb in zip(
        jax.tree_util.tree_leaves(res_sd.state.params),
        jax.tree_util.tree_leaves(res_dp.state.params),
    ):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-2, atol=1e-4)


def test_fit_dp_dataset_smaller_than_batch(rng):
    """A dataset smaller than one batch must still yield FULL tail-padded
    batches (idx tiled cyclically) or shard_map divisibility breaks —
    e.g. 6 rows at batch 16 over 8 devices previously emitted a 12-row
    batch."""
    x, y = _toy_data(rng, n=6)
    model = CNNBiLSTMHybrid(
        fixed_attention=True, logits=True, conv_dropout=0.0, dropout_rate=0.0,
        bn_axis_name="data",
    )
    state = _make_state(model, x)
    res = fit(state, (x, y), (x, y), batch_size=16, data_parallel=True,
              loss_name="BCELoss", binary_head=True, num_epochs=1, plots=False)
    assert len(res.logs) == 1 and np.isfinite(res.logs[0].train_loss)


def test_fit_dp_validates_batch_divisibility():
    import jax.numpy as jnp  # noqa: F401

    x = np.zeros((8, 19, 63), np.float32)
    y = np.zeros(8, np.int64)
    model = CNNBiLSTMHybrid(fixed_attention=True, logits=True)
    state = _make_state(model, x)
    with pytest.raises(ValueError, match="not divisible"):
        fit(state, (x, y), (x, y), batch_size=3, data_parallel=True,
            loss_name="BCELoss", binary_head=True, num_epochs=1, plots=False)


def test_fit_and_evaluate_end_to_end(rng, tmp_path):
    x, y = _toy_data(rng, n=96)
    model = CNNBiLSTMHybrid(fixed_attention=True, logits=True)
    state = _make_state(model, x)
    run_dir = str(tmp_path / "run")
    result = fit(
        state, (x, y), (x, y),
        loss_name="BCELoss", num_epochs=3, batch_size=32,
        run_dir=run_dir, binary_head=True, plots=False,
    )
    assert len(result.logs) == 3
    assert os.path.exists(os.path.join(run_dir, "best_model.msgpack"))
    assert os.path.exists(os.path.join(run_dir, "training_log.csv"))
    m = evaluate(result.best_state, (x, y), loss_name="BCELoss", binary_head=True)
    assert set(m) == {"accuracy", "f1", "eer", "loss"}
    assert m["accuracy"] > 0.5


def test_checkpoint_roundtrip(rng, tmp_path):
    x, y = _toy_data(rng, n=16)
    model = CNNBiLSTMHybrid(fixed_attention=True, logits=True)
    state = _make_state(model, x)
    step = jax.jit(make_train_step(get_loss("BCELoss"), binary_head=True))
    state, _ = step(state, x, y, jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, state, metadata={"note": "test"})

    fresh = _make_state(model, x)
    restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(restored.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resume: both must produce identical next-step params
    s1, _ = step(state, x, y, jax.random.PRNGKey(9))
    s2, _ = step(restored, x, y, jax.random.PRNGKey(9))
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_bilstm_pipeline_smoke(rng, tmp_path):
    n = 48
    x = rng.standard_normal((n, 63, 19)).astype(np.float32)
    y = (x.mean(axis=(1, 2)) > 0).astype(np.int64)
    result, final = bilstm_pipeline(
        (x, y), (x, y),
        num_epochs=2, optimizer_name="Adam", criterion_name="CrossEntropyLoss",
        lr=1e-3, batch_size=16, hidden=16, model_dir=str(tmp_path / "GMM-BiLSTM"),
    )
    assert {"accuracy", "f1", "eer", "loss"} <= set(final)
    cfg_dir = tmp_path / "GMM-BiLSTM" / "Adam_CrossEntropyLoss_lr0_001"
    assert (cfg_dir / "best_model.msgpack").exists()
    assert (cfg_dir / "worst_model.msgpack").exists()
    assert (cfg_dir / "metrics.json").exists()


def test_multi_input_training(rng):
    """MoreFeaturesClassifier (3 feature maps) trains through the same step."""
    from audioanalysisdetector_tpu.models.resnet import MoreFeaturesClassifier

    n = 16
    xs = tuple(
        jnp.asarray(rng.standard_normal((n, 10, 12)).astype(np.float32)) for _ in range(3)
    )
    y = np.asarray(rng.integers(0, 2, n), dtype=np.int64)
    model = MoreFeaturesClassifier()
    v = model.init(jax.random.PRNGKey(0), *xs, train=False)
    state = TrainState.create(
        apply_fn=model.apply, params=v["params"],
        tx=make_optimizer("Adam", 1e-3), batch_stats=v["batch_stats"],
    )
    step = jax.jit(make_train_step(get_loss("CrossEntropyLoss")))
    state, m = step(state, xs, jnp.asarray(y), jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1


def test_train_3features_driver(rng, tmp_path):
    """End-to-end trainer for the shared-trunk fusion net — the notebook's
    ``train_loop_3features`` (ASV_deep_learning.ipynb cells 32-33; round-2
    review Missing #3). Artifacts + metrics JSON must land in the run dir."""
    from audioanalysisdetector_tpu.train import train_3features

    n = 24
    shapes = ((19, 15), (13, 15), (13, 15))  # cqcc / gtcc / mfcc style
    y = rng.integers(0, 2, n).astype(np.int64)
    feats = []
    for s in shapes:
        x = rng.standard_normal((n,) + s).astype(np.float32)
        x[y == 1] += 0.6
        feats.append(x)
    out_dir = str(tmp_path / "mf")
    out = train_3features(
        tuple(f[:16] for f in feats), y[:16],
        tuple(f[16:] for f in feats), y[16:],
        epochs=2, batch_size=8, out_dir=out_dir,
    )
    assert {"accuracy", "f1", "eer"} <= set(out["best"])
    assert os.path.exists(os.path.join(out_dir, "metrics.json"))
    assert os.path.exists(os.path.join(out_dir, "best_model.msgpack"))


def test_train_mfca_driver(rng, tmp_path):
    """MobileNetV2+MFCA trainer — the notebook's ``train_loop_mfca``
    (ASV_deep_learning.ipynb cells 29-31)."""
    from audioanalysisdetector_tpu.train import train_mfca

    n = 16
    x = rng.standard_normal((n, 32, 12)).astype(np.float32)
    y = rng.integers(0, 2, n).astype(np.int64)
    x[y == 1] += 0.5
    out_dir = str(tmp_path / "mfca")
    out = train_mfca(
        x[:12], y[:12], x[12:], y[12:],
        epochs=1, batch_size=4, out_dir=out_dir,
    )
    assert {"accuracy", "f1", "eer"} <= set(out["best"])
    assert os.path.exists(os.path.join(out_dir, "metrics.json"))


def test_train_step_with_spec_augment(rng):
    """SpecAugment runs inside the compiled step (BASELINE config #3)."""
    from functools import partial

    from audioanalysisdetector_tpu.data.augment import spec_augment

    x, y = _toy_data(rng, n=32)
    model = CNNBiLSTMHybrid(fixed_attention=True, logits=True)
    state = _make_state(model, x)
    aug = partial(spec_augment, n_time_masks=1, n_freq_masks=1,
                  max_time_width=4, max_freq_width=4)
    step = jax.jit(make_train_step(
        get_loss("BCELoss"), binary_head=True,
        augment_fn=lambda xb, r: aug(xb, r),
    ))
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(15):
        key, sub = jax.random.split(key)
        state, m = step(state, x, y, sub)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # still learns under masking


def test_orbax_checkpoint_roundtrip(rng, tmp_path):
    from audioanalysisdetector_tpu.train.checkpoint import (
        restore_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    x, y = _toy_data(rng, n=8)
    model = CNNBiLSTMHybrid(fixed_attention=True, logits=True)
    state = _make_state(model, x)
    step = jax.jit(make_train_step(get_loss("BCELoss"), binary_head=True))
    state, _ = step(state, x, y, jax.random.PRNGKey(0))
    path = save_checkpoint_orbax(str(tmp_path / "orbax"), state)
    fresh = _make_state(model, x)
    restored = restore_checkpoint_orbax(path, fresh)
    assert int(restored.step) == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(restored.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eer_matches_sklearn_on_saturated_scores(rng):
    """The reference's EER runs argmin over sklearn's DEFAULT
    (drop_intermediate=True) ROC; degenerate score runs — routine with
    saturated sigmoids — are where keeping every collinear point can pick
    a different crossover."""
    for trial in range(20):
        r = np.random.default_rng(trial)
        y = r.integers(0, 2, 80)
        # quantized / saturated scores: long same-value runs
        s = np.round(r.random(80) * 4) / 4 + y * 0.1
        fpr, tpr, _ = roc_curve(y, s, pos_label=1)
        fnr = 1 - tpr
        ref = fpr[np.nanargmin(np.abs(fnr - fpr))]
        assert np.isclose(eer(y, s), ref), trial


def test_eer_drop_intermediate_crossing_run():
    """A straight same-class ROC segment CROSSING the fnr=fpr diagonal is
    the case where the thinning matters: sklearn keeps only the segment's
    corners, so the reference picks a corner (EER 0.0 here) while the
    drop-none curve picks the interior crossover point (0.5) — a massive
    divergence pinned exactly."""
    y = np.array([1] * 4 + [0] * 10)
    s = np.concatenate([np.array([0.9, 0.8, 0.3, 0.2]), np.linspace(0.7, 0.4, 10)])
    fpr, tpr, _ = roc_curve(y, s, pos_label=1)
    ref = fpr[np.nanargmin(np.abs(1 - tpr - fpr))]
    assert np.isclose(eer(y, s), ref) and np.isclose(ref, 0.0)


def test_eer_single_class_raises():
    with pytest.raises(ValueError, match="single class"):
        eer(np.ones(10, int), np.random.default_rng(0).random(10))
