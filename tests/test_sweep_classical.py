"""Sweep driver, classical bridge, and GMM-system orchestration tests."""

import os

import numpy as np
import pandas as pd

from audioanalysisdetector_tpu.models.gmm import score
from audioanalysisdetector_tpu.train.classical import (
    expand_feature_columns,
    generate_feature_sets,
    preprocess_for_modeling,
    run_extensive_gridsearch,
)
from audioanalysisdetector_tpu.train.gmm_system import load_gmm_models, train_gmm_system
from audioanalysisdetector_tpu.train.sweep import train_all_features, train_feature_model


def test_expand_feature_columns(rng):
    df = pd.DataFrame(
        {
            "vec": [rng.standard_normal(3) for _ in range(4)],
            "dct": [{"a": 1.0, "b": 2.0}] * 4,
            "label": ["spoof", "bonafide"] * 2,
        }
    )
    out = expand_feature_columns(df, ["vec", "dct"], "label")
    assert {"vec_0", "vec_1", "vec_2", "dct_a", "dct_b", "label"} == set(out.columns)
    assert len(out) == 4


def test_preprocess_for_modeling(rng):
    n = 60
    df = pd.DataFrame(rng.standard_normal((n, 4)), columns=list("abcd"))
    df["label"] = ["spoof"] * 40 + ["bonafide"] * 20
    X_tr, X_te, y_tr, y_te, scaler = preprocess_for_modeling(df)
    # train oversampled to balance
    assert (y_tr == 0).sum() == (y_tr == 1).sum()
    np.testing.assert_allclose(X_tr.mean(0), 0, atol=0.3)
    assert len(X_te) == 12


def test_generate_feature_sets():
    sets = list(generate_feature_sets(["a", "b"]))
    names = [n for n, _ in sets]
    assert names == ["all", "a", "b", "a_plus_b", "b_plus_a"]


def test_extract_features_formants_column(tmp_path, rng):
    """'formants' routes through the host Burg/roots hybrid and produces
    DICT cells that expand_feature_columns explodes into scalar columns —
    the reference's classical 6th feature (reference/train_fun.py:340-344,
    :227-246), previously unreachable (round-2 review Missing #1)."""
    import pandas as pd

    from audioanalysisdetector_tpu.data.pipeline import extract_features
    from audioanalysisdetector_tpu.io.audio import write_wav

    paths = []
    for i in range(3):
        t = np.arange(16000) / 16000
        y = (0.4 * np.sin(2 * np.pi * 150 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, y, 16000)
        paths.append(p)
    df = pd.DataFrame({"file_path": paths, "label": ["bonafide", "spoof", "spoof"]})
    df["chunk_start"], df["chunk_end"] = 0.0, 1.0
    out = extract_features(df, ["formants", "wpt"], sr=16000, mean=True)
    assert all(isinstance(c, dict) and len(c) == 10 for c in out["formants"])
    # wpt has NO time axis: mean=True must not collapse its 8 band energies
    # (reference extract_wpt returns the 8-vector, reference/train_fun.py:132-138)
    assert all(np.asarray(c).shape == (8,) for c in out["wpt"])
    expanded = expand_feature_columns(out, ["formants", "wpt"], "label")
    assert "formants_silence_ratio" in expanded.columns
    assert "formants_vtl_total_duration" in expanded.columns
    assert {"wpt_0", "wpt_7"} <= set(expanded.columns) and len(expanded) == 3


def test_classical_main_end_to_end(tmp_path):
    """Metadata-driven classical pipeline (reference/train_fun.py:305-403):
    sample caps, mixed vector+dict features, expansion, PCA+SVC/XGB grids
    with Memory caching (round-2 review Missing #2)."""
    from audioanalysisdetector_tpu.data.synthetic import make_surrogate_corpus
    from audioanalysisdetector_tpu.train.classical import classical_main

    meta, flac_dir = make_surrogate_corpus(
        str(tmp_path / "c"), n_bonafide=10, n_spoof_per_tier=4,
        seconds=1.5, seed=3, subset="train",
    )
    cache = str(tmp_path / "cache")
    out = classical_main(
        {"LA": {"metadata": meta, "flac": [flac_dir]}},
        seconds=1.5,
        features=("wpt", "formants"),
        pca_components=(4,),
        cv=2,
        cache_dir=cache,
        verbose=False,
    )
    assert set(out) == {"svm", "xgb", "n_train", "n_test"}
    for arm in ("svm", "xgb"):
        assert 0.0 <= out[arm]["accuracy"] <= 1.0
        assert "pca__n_components" in out[arm]["best_params"]
    assert os.path.exists(cache) and os.listdir(cache)  # Memory cache used

    # sample-cap behavior: cap of 6 limits the ingested rows
    capped = classical_main(
        {"XX": {"metadata": meta, "flac": [flac_dir]}},
        seconds=1.5, features=("wpt",), pca_components=(2,), cv=2,
        sample_caps={}, default_cap=10, verbose=False,
    )
    assert capped["n_test"] == 2  # 10 files -> 8/2 split


def test_default_xgb_grid_matches_reference():
    """The default XGB search space is the reference's full 6-key grid
    (reference/ASV_dl_func.py:1613-1619); the HGB fallback keeps exactly the
    keys _XGB_PARAM_MAP can express and real xgboost would get all 6."""
    from audioanalysisdetector_tpu.train.classical import (
        _XGB_PARAM_MAP,
        _xgb_like,
        DEFAULT_XGB_PARAMS,
    )

    assert DEFAULT_XGB_PARAMS == {
        "clf__n_estimators": [50, 100],
        "clf__max_depth": [3, 5],
        "clf__learning_rate": [0.1, 0.05],
        "clf__subsample": [0.8, 1],
        "clf__colsample_bytree": [0.8, 1],
        "clf__gamma": [0, 1],
    }
    clf, param_map = _xgb_like(0)
    try:
        import xgboost  # noqa: F401

        # real xgboost: the grid is swept verbatim (param_map is None)
        assert param_map is None
        effective = DEFAULT_XGB_PARAMS
    except ImportError:
        assert param_map is _XGB_PARAM_MAP
        effective = {
            param_map[k]: v for k, v in DEFAULT_XGB_PARAMS.items() if k in param_map
        }
        assert set(effective) == {"clf__max_iter", "clf__max_depth", "clf__learning_rate"}
    # every effective key must be a real constructor knob of the classifier
    valid = set(clf.get_params())
    for k in effective:
        assert k.removeprefix("clf__") in valid, k


def test_extensive_gridsearch_smoke(tmp_path, rng):
    n = 60
    X = rng.standard_normal((n, 6))
    y = (X[:, 0] > 0).astype(int)
    X[y == 1, 1] += 2.0
    cols = [f"f{i}" for i in range(6)]
    df_tr = pd.DataFrame(X[:40], columns=cols)
    df_tr["label"] = y[:40]
    df_te = pd.DataFrame(X[40:], columns=cols)
    df_te["label"] = y[40:]
    top, full = run_extensive_gridsearch(
        df_tr, df_te,
        svm_params={"clf__C": [1], "clf__kernel": ["rbf"]},
        xgb_params={"clf__n_estimators": [20], "clf__max_depth": [3], "clf__learning_rate": [0.1]},
        cv=2, components=(3,), out_dir=str(tmp_path / "gs"), n_jobs=1,
    )
    assert full is not None and len(full) > 0
    assert {"SVM", "XGB"} == set(full["model"].unique())
    assert os.path.exists(tmp_path / "gs" / "gridsearch_summary.csv")
    assert full["test_score"].max() > 0.7


def test_train_feature_model_cell(tmp_path, rng):
    n = 48
    tr_x = rng.standard_normal((n, 19, 63)).astype(np.float32)
    y = (tr_x.mean(axis=(1, 2)) > 0).astype(np.int64)
    tr_x[y == 1] += 0.3
    out = train_feature_model(
        tr_x, y, tr_x, y, feature_name="cqcc", epochs=2, batch_size=16,
        out_dir=str(tmp_path / "Res_Net"),
    )
    cell = tmp_path / "Res_Net" / "Adam_CrossEntropyLoss"
    assert (cell / "cqcc_scaler.npz").exists()
    assert (cell / "cqcc_logs.json").exists()
    assert (cell / "cqcc_metrics.json").exists()
    assert (cell / "cqcc" / "best_model.msgpack").exists()
    assert "eer" in out["best"]


def test_train_all_features_grid(tmp_path, rng):
    n = 24
    x = rng.standard_normal((n, 8, 12)).astype(np.float32)
    y = rng.integers(0, 2, n).astype(np.int64)
    results = train_all_features(
        {"mfcc": (x, x)}, y, y,
        optimizers=("Adam",), criteria=("CrossEntropyLoss", "MSELoss"),
        epochs=1, batch_size=12, out_dir=str(tmp_path / "sweep"),
    )
    assert len(results) == 2
    assert os.path.exists(tmp_path / "sweep" / "sweep_summary.json")


def test_gmm_system_train_and_reload(tmp_path, rng):
    import jax.numpy as jnp

    n, t, f = 40, 20, 5
    seqs = rng.standard_normal((n, t, f)).astype(np.float32)
    labels = np.array([0] * 20 + [1] * 20)
    seqs[labels == 1] += 1.5  # separable classes
    ubm, g_gen, g_spoof = train_gmm_system(
        seqs, labels, n_components=4, max_iter=20, model_dir=str(tmp_path / "gmm"),
    )
    ubm2, g_gen2, g_spoof2 = load_gmm_models(str(tmp_path / "gmm"))
    np.testing.assert_array_equal(np.asarray(ubm.means), np.asarray(ubm2.means))
    # adapted models separate their own classes
    genuine_frames = jnp.asarray(seqs[labels == 0].reshape(-1, f))
    spoof_frames = jnp.asarray(seqs[labels == 1].reshape(-1, f))
    assert float(score(genuine_frames, g_gen)) > float(score(genuine_frames, g_spoof))
    assert float(score(spoof_frames, g_spoof)) > float(score(spoof_frames, g_gen))


def test_gmm_feature_fn_cmvn(tmp_path, rng):
    """cmvn=True trains on per-utterance-normalized frames; the scorer given
    the SAME feature_fn separates classes that differ only beyond an additive
    per-utterance channel offset (the transform's whole point)."""
    import jax.numpy as jnp

    from audioanalysisdetector_tpu.train.gmm_system import (
        make_gmm_feature_fn,
        sequence_cmvn,
    )

    # identity composition
    assert make_gmm_feature_fn(deltas=False, cmvn=False) is None

    n, t, f = 40, 20, 5
    seqs = rng.standard_normal((n, t, f)).astype(np.float32)
    labels = np.array([0] * 20 + [1] * 20)
    # class signal = per-frame shape difference (scale), NOT a mean offset
    seqs[labels == 1] *= 2.5
    # nuisance: random per-utterance channel offset that swamps raw frames
    seqs += rng.standard_normal((n, 1, f)).astype(np.float32) * 10.0

    norm = np.asarray(sequence_cmvn(jnp.asarray(seqs)))
    np.testing.assert_allclose(norm.mean(axis=1), 0.0, atol=1e-5)
    np.testing.assert_allclose(norm.std(axis=1), 1.0, atol=1e-3)

    fn = make_gmm_feature_fn(deltas=True, cmvn=True)
    out = np.asarray(fn(jnp.asarray(seqs)))
    assert out.shape == (n, t, 3 * f)
    np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-4)

    _, g_gen, g_spoof = train_gmm_system(
        seqs, labels, n_components=4, max_iter=20, cmvn=True,
        model_dir=str(tmp_path / "gmm_cmvn"),
    )
    # the transform is persisted next to the models and recomposed on load
    # (a CMVN-trained GMM scored on raw frames diverges silently)
    from audioanalysisdetector_tpu.train.gmm_system import load_gmm_feature_fn

    fn = load_gmm_feature_fn(str(tmp_path / "gmm_cmvn"))
    assert fn is not None
    assert load_gmm_feature_fn(str(tmp_path)) is None  # pre-metadata dirs
    gen = jnp.asarray(fn(jnp.asarray(seqs[labels == 0])).reshape(-1, f))
    spoof = jnp.asarray(fn(jnp.asarray(seqs[labels == 1])).reshape(-1, f))
    assert float(score(gen, g_gen)) > float(score(gen, g_spoof))
    assert float(score(spoof, g_spoof)) > float(score(spoof, g_gen))


def test_eval_model_orchestration(tmp_path, rng):
    """eval_model loads-or-trains GMMs then runs the batched fused scorer."""
    import jax
    import jax.numpy as jnp

    from audioanalysisdetector_tpu.models.bilstm_classifier import BiLSTMClassifier
    from audioanalysisdetector_tpu.train.gmm_system import eval_model

    n, t, f = 32, 10, 5
    seqs = rng.standard_normal((n, t, f)).astype(np.float32)
    labels = np.array([0] * 16 + [1] * 16)
    seqs[labels == 1] += 1.5
    model = BiLSTMClassifier(hidden=8)
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(seqs[:1]), train=False)

    md = str(tmp_path / "GMM-BiLSTM")
    y_true, y_pred, m1 = eval_model(
        model.apply, v, seqs, labels, seqs, labels,
        model_dir=md, n_components=2, batch_size=16, verbose=False,
    )
    assert set(m1) == {"accuracy", "f1", "eer"}
    # second call takes the saved-models path and must agree
    _, _, m2 = eval_model(
        model.apply, v, None, None, seqs, labels,
        model_dir=md, batch_size=16, verbose=False,
    )
    assert m1 == m2


def test_prepare_train_test_data_multi(tmp_path, rng):
    import pandas as pd

    from audioanalysisdetector_tpu.data import prepare_train_test_data_multi

    tr = pd.DataFrame({
        "cqcc": [rng.standard_normal((19, 5)) * 3 + 1 for _ in range(6)],
        "mfcc": [rng.standard_normal((13, 5)) for _ in range(6)],
    })
    te = tr.iloc[:2].copy()
    tr2, te2, scalers = prepare_train_test_data_multi(
        tr, te, ["cqcc", "mfcc"], model_dir=str(tmp_path)
    )
    assert set(scalers) == {"cqcc", "mfcc"}
    stacked = np.vstack([v for v in tr2["cqcc"]])
    np.testing.assert_allclose(stacked.mean(0), 0, atol=1e-4)
    import os

    assert os.path.exists(tmp_path / "cqcc_scaler.npz")


def test_train_gridsearch_simple(rng):
    from audioanalysisdetector_tpu.train.classical import train_gridsearch

    X = rng.standard_normal((40, 4))
    y = (X[:, 0] > 0).astype(int)
    grid = train_gridsearch(X, y, param_grid={"C": [1], "kernel": ["linear"]}, cv=2)
    assert grid.best_score_ > 0.7
