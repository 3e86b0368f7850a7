"""Reference-parity helper tests: shape utils, failure policy, visualizers,
txt log, load_bilstm_model."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pandas as pd

from audioanalysisdetector_tpu.data import extract_features, filtr_nan
from audioanalysisdetector_tpu.data.shape_utils import (
    build_X_from_df,
    prepare_data_gmm_bilstm,
    to_array_safe,
)
from audioanalysisdetector_tpu.io.audio import write_wav
from audioanalysisdetector_tpu.xai import (
    perturb_random_features_mean,
    perturb_segments,
    plot_cqcc_pipeline,
    plot_gradcam_overlay,
    visualize_feature_perturbation,
    visualize_segment_perturbation,
)


def test_to_array_safe():
    assert to_array_safe(None).size == 0
    np.testing.assert_array_equal(to_array_safe([[1, 2], [3, 4]]), [1, 2, 3, 4])
    np.testing.assert_array_equal(to_array_safe(5.0), [5.0])


def test_build_X_from_df_ragged(rng):
    df = pd.DataFrame(
        {
            "a": [rng.standard_normal(3), rng.standard_normal(3), None],
            "b": [rng.standard_normal((2, 2)), None, rng.standard_normal(2)],
        }
    )
    X = build_X_from_df(df, ["a", "b"])
    assert X.shape == (3, 7)  # max row = 3 + 4
    assert (X[2, 2:] == 0).all()  # padded


def test_prepare_data_gmm_bilstm(rng):
    df = pd.DataFrame({"cqcc": [rng.standard_normal((19, 63)), None]})
    out = prepare_data_gmm_bilstm(df)
    assert len(out) == 1
    assert out["cqcc"].iloc[0].shape == (63, 19)  # time-major


def test_extract_features_failure_becomes_none(tmp_path, rng):
    good = str(tmp_path / "good.wav")
    write_wav(good, rng.standard_normal(32000).astype(np.float32) * 0.1, 16000)
    bad = str(tmp_path / "bad.wav")
    open(bad, "wb").write(b"RIFFnotawave")
    df = pd.DataFrame(
        {"file_path": [good, bad], "chunk_start": [0.0, 0.0], "chunk_end": [2.0, 2.0]}
    )
    out = extract_features(df, ["wpt"], batch_size=2)
    assert out["wpt"].iloc[0] is not None
    assert out["wpt"].iloc[1] is None  # the reference's None-on-error policy
    assert len(filtr_nan(out, "wpt")) == 1


def test_perturbation_visualizers(tmp_path, rng):
    x = jnp.asarray(rng.standard_normal((19, 63)).astype(np.float32))
    p, mask = perturb_random_features_mean(x, jax.random.PRNGKey(0), n_changed=4)
    path = visualize_feature_perturbation(
        np.asarray(x), np.asarray(p), np.asarray(mask),
        out_path=str(tmp_path / "feat.png"),
    )
    assert os.path.exists(path)
    p2, mask2 = perturb_segments(x, jax.random.PRNGKey(1), num_slices=9, n_changed=3)
    path2 = visualize_segment_perturbation(
        np.asarray(x), np.asarray(p2), np.asarray(mask2),
        out_path=str(tmp_path / "seg.png"),
    )
    assert os.path.exists(path2)


def test_plot_cqcc_pipeline_modes(tmp_path, rng):
    """reference/xai_func.py:465-525 parity panel: both perturbation modes
    render, scales- and mask-shaped info dicts both dispatch, and bad modes
    are rejected."""
    import pytest

    x = rng.standard_normal((19, 63)).astype(np.float32)
    p_time = plot_cqcc_pipeline(
        x, x * 1.1, {"mode": "time", "scales": [1.0, 1.5, 0.5, 1.0]},
        out_path=str(tmp_path / "time.png"),
    )
    assert os.path.exists(p_time)
    p_feat = plot_cqcc_pipeline(
        x, x + 1.0, {"mode": "feature", "mask": np.array([0, 1] * 9 + [0])},
        out_path=str(tmp_path / "feat.png"),
    )
    assert os.path.exists(p_feat)
    with pytest.raises(ValueError, match="mode"):
        plot_cqcc_pipeline(x, x, {"mode": "spectral"})


def test_plot_gradcam_overlay_resizes(tmp_path, rng):
    """ASV_deep_learning.ipynb cell-34 overlay: a coarse CAM grid is
    bilinearly upsampled onto the feature's own (F, T) axes."""
    feat = rng.standard_normal((64, 63)).astype(np.float32)
    cam = rng.random((4, 8)).astype(np.float32)
    path = plot_gradcam_overlay(
        feat, cam, sr=16000, hop_length=512, out_path=str(tmp_path / "cam.png")
    )
    assert os.path.exists(path)


def test_txt_log_and_load_bilstm_model(tmp_path, rng):
    from audioanalysisdetector_tpu.train import bilstm_pipeline, load_bilstm_model

    x = rng.standard_normal((24, 10, 19)).astype(np.float32)
    y = (x.mean(axis=(1, 2)) > 0).astype(np.int64)
    model_dir = str(tmp_path / "GMM-BiLSTM")
    bilstm_pipeline((x, y), (x, y), num_epochs=1, batch_size=8, hidden=8,
                    model_dir=model_dir)
    run_dir = os.path.join(model_dir, "Adam_CrossEntropyLoss_lr0_0001")
    txt = open(os.path.join(run_dir, "training_log.txt")).read()
    assert "epoch 0:" in txt and "best epoch:" in txt

    model, variables = load_bilstm_model(model_dir, hidden=8)
    out = model.apply(variables, jnp.asarray(x[:2]), train=False)
    assert out.shape == (2, 2)
