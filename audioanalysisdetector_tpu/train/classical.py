"""Classical-ML bridge: feature expansion, preprocessing, grid searches.

Counterparts of the reference's sklearn/xgboost layer, which is deliberately
host-side (not perf-critical; SURVEY.md §2.5): ``expand_feature_columns``
(reference/train_fun.py:227-246), ``preprocess_for_modeling`` (:249-286),
``run_grid_search`` (:289-302), and ``run_extensive_gridsearch``
(reference/ASV_dl_func.py:1589-1758) with its feature-set generator
(:1561-1572) and pipeline factory (:1575-1587).

The "XGB" arm uses real xgboost when importable (with the reference's full
6-key default grid, ``DEFAULT_XGB_PARAMS``); when xgboost is absent (as in
this image) it falls back to sklearn's HistGradientBoostingClassifier with
equivalent roles for the swept hyperparameters (documented per-key mapping
in ``_XGB_PARAM_MAP``; subsample/colsample/gamma have no HGB equivalent
and are dropped only in the fallback).
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np
import pandas as pd
from sklearn.decomposition import PCA, FastICA
from sklearn.metrics import accuracy_score, classification_report, f1_score
from sklearn.model_selection import GridSearchCV, StratifiedKFold, train_test_split
from sklearn.pipeline import Pipeline
from sklearn.preprocessing import StandardScaler
from sklearn.svm import SVC

LABEL_MAP = {"spoof": 1, "bonafide": 0}  # reference/train_fun.py:255


def expand_feature_columns(
    df: pd.DataFrame, feature_columns: list[str], label_column: str
) -> pd.DataFrame:
    """Explode vector/dict feature cells into scalar columns."""
    expanded_list = []
    for col in feature_columns:
        df_clean = df.dropna(subset=[col])
        if df_clean.empty:
            raise ValueError(
                f"feature column {col!r} has no non-null cells — its "
                "extractor failed for every row (check the per-file warnings)"
            )
        first = df_clean[col].iloc[0]
        if isinstance(first, dict):
            expanded = df_clean[col].apply(pd.Series)
            expanded.columns = [f"{col}_{key}" for key in expanded.columns]
        else:
            expanded = pd.DataFrame(
                [np.ravel(np.asarray(v)) for v in df_clean[col]], index=df_clean.index
            )
            expanded.columns = [f"{col}_{i}" for i in range(expanded.shape[1])]
        expanded_list.append(expanded)
    final = pd.concat(expanded_list, axis=1)
    return pd.concat([final, df[label_column]], axis=1).dropna()


def preprocess_for_modeling(df: pd.DataFrame, label_col: str = "label"):
    """Label map {spoof:1, bonafide:0}, stratified split, train-only
    oversampling, StandardScaler (the reference's exact order)."""
    df = df.copy()
    df[label_col] = df[label_col].astype(str).str.lower().map(LABEL_MAP)
    df = df.dropna(subset=[label_col])
    X = df.drop(columns=[label_col])
    y = df[label_col].astype(int)
    X_train, X_test, y_train, y_test = train_test_split(
        X, y, test_size=0.2, stratify=y, random_state=42
    )
    train_df = pd.concat([X_train, y_train], axis=1)
    c0 = train_df[train_df[label_col] == 0]
    c1 = train_df[train_df[label_col] == 1]
    if len(c0) == 0 or len(c1) == 0:
        raise ValueError("training split lacks one of the classes; cannot oversample")
    rng = np.random.default_rng(42)
    if len(c0) > len(c1):
        c1 = c1.iloc[rng.integers(0, len(c1), len(c0))]
    else:
        c0 = c0.iloc[rng.integers(0, len(c0), len(c1))]
    balanced = pd.concat([c0, c1])
    scaler = StandardScaler()
    X_train_scaled = scaler.fit_transform(balanced.drop(columns=[label_col]))
    X_test_scaled = scaler.transform(X_test)
    return X_train_scaled, X_test_scaled, balanced[label_col].values, y_test.values, scaler


def run_grid_search(grid: GridSearchCV, X_train, y_train, X_test, y_test):
    grid.fit(X_train, y_train)
    best = grid.best_estimator_
    y_pred = best.predict(X_test)
    return grid, accuracy_score(y_test, y_pred), f1_score(y_test, y_pred)


def generate_feature_sets(feature_cols: list[str]) -> Iterator[tuple[str, list[str]]]:
    """all / singletons / ordered pairs (reference/ASV_dl_func.py:1561-1572)."""
    yield ("all", list(feature_cols))
    for c in feature_cols:
        yield (c, [c])
    for c in feature_cols:
        for other in feature_cols:
            if other != c:
                yield (f"{c}_plus_{other}", [c, other])


def _xgb_like(random_state: int):
    try:
        from xgboost import XGBClassifier

        return XGBClassifier(eval_metric="logloss", random_state=random_state), None
    except ImportError:
        from sklearn.ensemble import HistGradientBoostingClassifier

        return HistGradientBoostingClassifier(random_state=random_state), _XGB_PARAM_MAP


# xgboost -> HistGradientBoosting hyperparameter role mapping (fallback only)
_XGB_PARAM_MAP = {
    "clf__n_estimators": "clf__max_iter",
    "clf__max_depth": "clf__max_depth",
    "clf__learning_rate": "clf__learning_rate",
    # subsample / colsample / gamma have no HGB equivalent; dropped in fallback
}

# the reference's full 6-key default XGB grid
# (reference/ASV_dl_func.py:1613-1619) — swept verbatim when real xgboost is
# importable; the HGB fallback keeps the 3 keys _XGB_PARAM_MAP can express
DEFAULT_XGB_PARAMS = {
    "clf__n_estimators": [50, 100],
    "clf__max_depth": [3, 5],
    "clf__learning_rate": [0.1, 0.05],
    "clf__subsample": [0.8, 1],
    "clf__colsample_bytree": [0.8, 1],
    "clf__gamma": [0, 1],
}


def make_search_pipeline(
    reducer: str | None, n_comp: int | None, standardize: bool, classifier,
    *, memory=None,
) -> Pipeline:
    """``memory``: a joblib.Memory (or cache dir path) that caches fitted
    transformers — identical (scaler, reducer) prefixes are then fit once
    across the whole sweep (the reference's ``joblib.Memory`` trick,
    reference/train_fun.py:364-370)."""
    steps = []
    if standardize:
        steps.append(("scaler", StandardScaler()))
    if reducer == "pca" and n_comp is not None:
        steps.append(("reducer", PCA(n_components=n_comp, random_state=42)))
    elif reducer == "ica" and n_comp is not None:
        steps.append(("reducer", FastICA(n_components=n_comp, random_state=42)))
    steps.append(("clf", classifier))
    return Pipeline(steps, memory=memory)


def run_extensive_gridsearch(
    df_train: pd.DataFrame,
    df_test: pd.DataFrame,
    feature_cols: list[str] | None = None,
    *,
    feature_groups: dict[str, list[str]] | None = None,
    svm_params: dict | None = None,
    xgb_params: dict | None = None,
    cv: int = 3,
    scoring: str = "accuracy",
    n_jobs: int = -1,
    min_samples: int = 10,
    top_k: int = 5,
    label_col: str = "label",
    out_dir: str = "gridsearch_results",
    components: tuple[int, ...] = (10, 20, 30, 40),
    random_state: int = 42,
    cache_dir: str | None = None,
):
    """Sweep feature sets x {std} x {None, PCA, ICA} x components x {SVM, XGB};
    summary + top-k CSVs (the reference's exact search space and defaults).

    ``cache_dir`` enables joblib.Memory pipeline caching: every (scaler,
    reducer) prefix is fit ONCE per feature set instead of once per
    classifier x param combo (reference/train_fun.py:364-370)."""
    memory = None
    if cache_dir is not None:
        from joblib import Memory

        os.makedirs(cache_dir, exist_ok=True)
        memory = Memory(location=cache_dir, verbose=0)
    if svm_params is None:
        svm_params = {"clf__C": [1, 10], "clf__kernel": ["rbf"], "clf__gamma": ["scale", 0.1]}
    if xgb_params is None:
        xgb_params = DEFAULT_XGB_PARAMS
    os.makedirs(out_dir, exist_ok=True)
    y_train = df_train[label_col].values
    y_test = df_test[label_col].values
    results = []

    if feature_groups:
        # the reference's sweep shape: all / singletons / ordered pairs of
        # BASE features, each mapped to its expanded scalar columns
        # (reference/ASV_dl_func.py:1561-1572 via generate_feature_sets)
        feature_sets = [
            (name, [c for g in groups for c in feature_groups[g]])
            for name, groups in generate_feature_sets(list(feature_groups))
        ]
    elif feature_cols is None:
        feature_sets = [("all_features", [c for c in df_train.columns if c != label_col])]
    else:
        feature_sets = [("selected_features", feature_cols)]
    for fs_name, fs_cols in feature_sets:
        X_train = df_train[fs_cols].values
        X_test = df_test[fs_cols].values
        if X_train.shape[0] < min_samples:
            continue
        n_features = X_train.shape[1]
        for standardize in (False, True):
            for reducer in (None, "pca", "ica"):
                comp_list = components if reducer else (None,)
                for n_comp in comp_list:
                    if n_comp is not None and n_comp >= n_features:
                        continue
                    arms = [("SVM", SVC(probability=True, random_state=random_state), svm_params)]
                    xgb, param_map = _xgb_like(random_state)
                    params = (
                        {param_map[k]: v for k, v in xgb_params.items() if k in param_map}
                        if param_map
                        else xgb_params
                    )
                    arms.append(("XGB", xgb, params))
                    for model_name, clf, param_grid in arms:
                        pipe = make_search_pipeline(
                            reducer, n_comp, standardize, clf, memory=memory
                        )
                        try:
                            gs = GridSearchCV(
                                pipe,
                                param_grid,
                                cv=StratifiedKFold(cv, shuffle=True, random_state=random_state),
                                scoring=scoring,
                                n_jobs=n_jobs,
                            )
                            gs.fit(X_train, y_train)
                            y_pred = gs.predict(X_test)
                            rep = classification_report(y_test, y_pred, output_dict=True)
                        except Exception as e:  # per-combo failures are skipped
                            print(f"  {model_name} failed (std={standardize}, "
                                  f"reducer={reducer}, n_comp={n_comp}): {e}")
                            continue
                        results.append({
                            "model": model_name,
                            "feature_set": fs_name,
                            "std": standardize,
                            "reducer": reducer,
                            "n_comp": n_comp,
                            "train_score": gs.best_score_,
                            "test_score": accuracy_score(y_test, y_pred),
                            "precision": rep["weighted avg"]["precision"],
                            "recall": rep["weighted avg"]["recall"],
                            "f1": rep["weighted avg"]["f1-score"],
                            "best_params": json.dumps(gs.best_params_, default=str),
                        })

    df_res = pd.DataFrame(results)
    if df_res.empty:
        print("no grid-search results to save")
        return None, None
    df_res = df_res.sort_values("test_score", ascending=False).reset_index(drop=True)
    top = df_res.head(top_k)
    df_res.to_csv(os.path.join(out_dir, "gridsearch_summary.csv"), index=False)
    top.to_csv(os.path.join(out_dir, f"top_{top_k}_models.csv"), index=False)
    return top, df_res


CLASSICAL_FEATURES = ("mfcc", "lfcc", "cqcc", "gtcc", "wpt", "formants")


def classical_main(
    all_data: dict[str, dict],
    *,
    sr: int = 16000,
    seconds: float = 4.0,
    sample_caps: dict[str, int] | None = None,
    default_cap: int = 2500,
    features: tuple[str, ...] = CLASSICAL_FEATURES,
    pca_components: tuple[int, ...] = (10, 20, 30, 40),
    svm_c: tuple[int, ...] = (1, 10),
    n_estimators: tuple[int, ...] = (50, 100),
    max_depth: tuple[int, ...] = (3, 5),
    cv: int = 3,
    cache_dir: str | None = None,
    extension: str = ".flac",
    seed: int = 42,
    verbose: bool = True,
) -> dict:
    """The reference's classical end-to-end ``main()``
    (reference/train_fun.py:305-403), metadata-driven:

    per-dataset metadata -> existing-file resolution -> sample caps
    (LA 5000 / others 2500, :321-331) -> batched extraction of the 6
    features incl. the formant/silence dict (:334-344) -> dropna ->
    ``expand_feature_columns`` (dict + vector cells, :227-246) ->
    ``preprocess_for_modeling`` -> PCA+SVC and PCA+XGB ``GridSearchCV``
    (cv=3, accuracy) with joblib.Memory pipeline caching (:364-370).

    One deviation, documented: the reference extracts over WHOLE files
    (variable length); XLA wants static shapes, so features are computed
    over a fixed ``seconds`` analysis window (zero-padded when shorter) —
    time-mean pooling makes the two near-identical for speech-length audio.

    Returns {"svm": {...}, "xgb": {...}, "n_train": int, "n_test": int}.
    """
    import tempfile

    from joblib import Memory

    from audioanalysisdetector_tpu.data.metadata import (
        prepare_filepaths,
        read_metadata,
    )
    from audioanalysisdetector_tpu.data.pipeline import extract_features

    sample_caps = sample_caps if sample_caps is not None else {"LA": 5000}
    rng = np.random.default_rng(seed)

    dfs = []
    for key, value in all_data.items():
        folders = value["flac"]
        if isinstance(folders, str):
            folders = [folders]
        for folder in folders:
            try:
                df = read_metadata(value["metadata"])
            except FileNotFoundError:
                print(f"WARNING: metadata file not found: {value['metadata']}")
                continue
            df = prepare_filepaths(df, folder, extension=extension)
            if verbose:
                print(f"found {len(df)} existing files for {key} in {os.path.basename(folder)}")
            if df.empty:
                continue
            cap = sample_caps.get(key, default_cap)
            if len(df) > cap:
                df = df.iloc[rng.permutation(len(df))[:cap]].copy()
            dfs.append(df)
    if not dfs:
        raise ValueError("no usable data from any configured dataset")
    final_df = pd.concat(dfs, ignore_index=True, join="inner")
    if verbose:
        print(f"total files to process: {len(final_df)}")

    # fixed analysis window (static shapes); mean-pooled like the reference's
    # whole-file extractors (reference/train_fun.py:69-141 all return means)
    final_df["chunk_start"], final_df["chunk_end"] = 0.0, float(seconds)
    final_df = extract_features(final_df, list(features), sr=sr, mean=True)

    initial = len(final_df)
    final_df = final_df.dropna(subset=list(features))
    if verbose:
        print(f"dropped {initial - len(final_df)} rows with extraction failures")
    if final_df.empty:
        raise ValueError("no valid rows after feature extraction")

    new_df = expand_feature_columns(final_df, list(features), "label")
    X_train, X_test, y_train, y_test, scaler = preprocess_for_modeling(new_df)
    if verbose:
        print(f"train (balanced): {X_train.shape}  test: {X_test.shape}")

    cache_dir = cache_dir or os.path.join(tempfile.gettempdir(), "aad_classical_cache")
    os.makedirs(cache_dir, exist_ok=True)
    memory = Memory(location=cache_dir, verbose=0)
    comps = [c for c in pca_components if c < X_train.shape[1]] or [
        max(X_train.shape[1] - 1, 1)
    ]

    def create_pipeline(clf):
        # Memory caches fitted transformers across grid combos, the
        # reference's exact speedup trick (reference/train_fun.py:364-370)
        return Pipeline([("pca", PCA(random_state=seed)), ("clf", clf)], memory=memory)

    out: dict = {"n_train": int(len(y_train)), "n_test": int(len(y_test))}

    svm_params = {
        "pca__n_components": comps, "clf__C": list(svm_c),
        "clf__kernel": ["rbf"], "clf__gamma": ["scale"],
    }
    grid_svm = GridSearchCV(
        create_pipeline(SVC(probability=True, random_state=seed)),
        svm_params, scoring="accuracy", cv=cv, n_jobs=-1,
    )
    _, acc, f1 = run_grid_search(grid_svm, X_train, y_train, X_test, y_test)
    out["svm"] = {"accuracy": acc, "f1": f1,
                  "best_params": {k: str(v) for k, v in grid_svm.best_params_.items()}}

    xgb, param_map = _xgb_like(seed)
    xgb_params = {
        "pca__n_components": comps,
        "clf__n_estimators": list(n_estimators),
        "clf__max_depth": list(max_depth),
        "clf__learning_rate": [0.1],
    }
    if param_map:
        xgb_params = {param_map.get(k, k): v for k, v in xgb_params.items()
                      if not k.startswith("clf__") or k in param_map}
    grid_xgb = GridSearchCV(
        create_pipeline(xgb), xgb_params, scoring="accuracy", cv=cv, n_jobs=-1
    )
    _, acc, f1 = run_grid_search(grid_xgb, X_train, y_train, X_test, y_test)
    out["xgb"] = {"accuracy": acc, "f1": f1,
                  "best_params": {k: str(v) for k, v in grid_xgb.best_params_.items()}}
    return out


def train_gridsearch(X_train, y_train, *, param_grid=None, cv: int = 3):
    """Small SVC grid search (the reference's ``train_gridsearch``,
    reference/xai_func.py:18-36): returns the fitted GridSearchCV."""
    if param_grid is None:
        param_grid = {"C": [0.1, 1, 10], "kernel": ["rbf", "linear"], "gamma": ["scale"]}
    grid = GridSearchCV(SVC(probability=True, random_state=42), param_grid, cv=cv)
    grid.fit(X_train, y_train)
    return grid
