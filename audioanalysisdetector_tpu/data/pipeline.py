"""Batched feature-extraction pipeline — the joblib fan-out, re-designed.

The reference extracts features one file per process via
``joblib.Parallel(n_jobs=-1)`` (reference/ASV_dl_func.py:1031-1049). The TPU
pipeline instead streams fixed-size waveform batches host->device and runs
the jitted frontend on whole batches: decode on host (the only part that
must stay there), augmentation + DSP + features on device.

``extract_features`` keeps the reference's DataFrame-in/DataFrame-out
contract (one ndarray per cell) so downstream code ports 1:1, while
``extract_feature_array`` returns the stacked array for array-native code.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from audioanalysisdetector_tpu.data.augment import AUG_CODES, apply_augmentations
from audioanalysisdetector_tpu.frontend import (
    CepstralConfig,
    CQCCConfig,
    MelConfig,
    MFCCConfig,
    cqcc,
    gfcc,
    lfcc,
    log_mel_spectrogram,
    mfcc,
    mfcc_deltas_cmvn,
    wpt_energies,
)
from audioanalysisdetector_tpu.io.native_loader import (
    load_chunk_batch_native as load_chunk_batch,
)


def default_extractors(sr: int = 16000) -> dict[str, Callable]:
    """Batched frontend extractors by reference column name.

    Callers get a fresh dict, but the extractor CALLABLES are cached per
    ``sr`` — stable function identities are what lets the jitted runners
    below (`_jitted_runners`) reuse their compiled programs across
    ``extract_features`` calls (e.g. train metadata then eval metadata)
    instead of re-tracing every frontend per call.
    """
    return dict(_extractor_registry(sr))


@lru_cache(maxsize=8)
def _extractor_registry(sr: int) -> dict[str, Callable]:
    return {
        "mfcc": lambda w: mfcc(w, MFCCConfig.for_sr(sr)),
        "lfcc": lambda w: lfcc(w, CepstralConfig(fs=sr, fb_kind="linear")),
        "cqcc": lambda w: cqcc(w, CQCCConfig.for_sr(sr)),
        "gtcc": lambda w: gfcc(w, CepstralConfig(fs=sr, nfilts=40, fb_kind="gammatone")),
        "wpt": wpt_energies,
        "mel_spectrogram": lambda w: log_mel_spectrogram(w, MelConfig(sr=sr, n_mels=64)),
        # BASELINE config #2: MFCC + delta/delta-delta + per-utterance CMVN.
        # Needs >= 9 frames (chunks >= ~0.26 s) for the Savitzky-Golay deltas;
        # incompatible with mean=True pooling (CMVN makes time means zero) —
        # extract_features guards both.
        "mfcc_deltas": lambda w: mfcc_deltas_cmvn(w, MFCCConfig.for_sr(sr)),
        # "formants" is also accepted by extract_features: the Burg-LPC /
        # root-finding hybrid (frontend.formants) produces DICT cells of 10
        # prosodic scalars for the classical path (reference/train_fun.py:340,
        # expanded by classical.expand_feature_columns). Host-routed, not in
        # this device-fn registry — see _extract_formants_cells.
    }


FORMANTS_FEATURE = "formants"


def _extract_formants_cells(
    df: pd.DataFrame,
    *,
    sr: int,
    batch_size: int,
    path_col: str,
) -> list[dict | None]:
    """Per-row prosodic dicts (``analyze_formants_and_silence``); decode is
    batched through the native loader, Burg LPC batches on device, the
    polynomial root-finding stays on host (frontend/formants.py — this
    feature feeds only the classical grid, never the hot path)."""
    from audioanalysisdetector_tpu.frontend.formants import (
        analyze_formants_and_silence,
    )

    from audioanalysisdetector_tpu.io.audio import audio_info

    paths = df[path_col].tolist()
    starts = df.get("chunk_start", pd.Series([0.0] * len(df))).tolist()
    ends = df.get("chunk_end", pd.Series([2.0] * len(df))).tolist()
    cells: list[dict | None] = []
    for lo in range(0, len(paths), batch_size):
        hi = min(lo + batch_size, len(paths))
        wav, ok = load_chunk_batch(
            paths[lo:hi], starts[lo:hi], ends[lo:hi], sr=sr, return_ok=True
        )
        # trim each row to the file's TRUE duration: the batch loader
        # zero-pads short reads to the fixed window, and padding silence
        # would dominate silence_ratio / segment stats (the reference's
        # Praat analysis sees the unpadded file, ASV_dl_func.py:343-401)
        true_n = []
        for j in range(lo, hi):
            try:
                info = audio_info(paths[j])
                avail = info.frames / info.samplerate - float(starts[j])
                true_n.append(int(max(0.0, min(avail, ends[j] - starts[j])) * sr))
            except Exception:  # unreadable: row already flagged by the loader
                true_n.append(wav.shape[1])
        for (row, good), n_real in zip(zip(wav, ok), true_n):
            row = row[: max(n_real, 1)]
            if not good:
                cells.append(None)
                continue
            try:
                cells.append(analyze_formants_and_silence(row, sr))
            except (ValueError, FloatingPointError) as e:
                # reference error policy (reference/ASV_dl_func.py:399-401):
                # a failing row (e.g. shorter than the analysis window)
                # becomes a None cell for filtr_nan, not a batch abort
                print(f"WARNING: formants failed for row {len(cells)}: {e}")
                cells.append(None)
    return cells


def _aug_codes_from(df: pd.DataFrame, aug_col: str) -> np.ndarray:
    if aug_col not in df.columns:
        return np.zeros(len(df), dtype=np.int32)
    return np.asarray(
        [AUG_CODES.get(v, 0) if not pd.isna(v) else 0 for v in df[aug_col]],
        dtype=np.int32,
    )


def _batch_sharding(batch_size: int):
    """Batch-axis sharding over all local devices, when it divides evenly.

    Featurization is per-row, so plain input sharding makes the jitted
    extractor an SPMD program over the mesh — no collectives, no shard_map;
    the pipeline then ingests at N-chip rate on a pod (SURVEY.md §2.6's
    replacement for the reference's joblib fan-out). None on one device.
    """
    n_dev = jax.local_device_count()
    if n_dev <= 1 or batch_size % n_dev != 0 or batch_size < n_dev:
        return None
    from jax.sharding import NamedSharding, PartitionSpec

    from audioanalysisdetector_tpu.parallel.mesh import make_mesh

    return NamedSharding(make_mesh(n_dev, axis="data"), PartitionSpec("data"))


# features whose OUTPUT layout is time-major (..., T, coeffs) — the spafe
# parity contract for lfcc/gfcc (frontend/cepstral.py) — vs the repo
# convention (..., coeffs, T). Mean pooling must reduce the TIME axis of
# whichever layout the feature uses (docs/PARITY.md: the reference copies
# disagree on the axis; the canonical semantic here is the time mean).
TIME_MAJOR_FEATURES = frozenset({"lfcc", "gtcc"})


def _jitted_runners(feature_fn: Callable, mean: bool, time_axis: int = -1):
    """Jitted plain/augmented runners, cached by (feature_fn, mean,
    time_axis) so repeated ``extract_features`` calls (train metadata then
    eval metadata) reuse compiled programs instead of re-tracing every
    frontend. Relies on ``default_extractors`` returning stable callables
    per ``sr``; an unhashable user callable just skips the cache."""
    try:
        return _jitted_runners_cached(feature_fn, mean, time_axis)
    except TypeError:
        return _build_runners(feature_fn, mean, time_axis)


@lru_cache(maxsize=64)
def _jitted_runners_cached(feature_fn: Callable, mean: bool, time_axis: int):
    return _build_runners(feature_fn, mean, time_axis)


def _build_runners(feature_fn: Callable, mean: bool, time_axis: int):
    def _finish(feats):
        # mean pooling reduces the TIME axis (position given by the
        # feature's layout); features with no time axis (wpt's (B, 8) band
        # energies, reference/train_fun.py:132-138) pass through unchanged
        # — pooling them would collapse the feature vector to one scalar
        if mean and feats.ndim > 2:
            return jnp.mean(feats, axis=time_axis)
        return feats

    @jax.jit
    def run_plain(wav):
        return _finish(feature_fn(wav))

    @jax.jit
    def run_augmented(wav, aug, key):
        # the augmented variant pays for the phase-vocoder pitch shift; only
        # batches that actually contain augmented rows take this path
        return _finish(feature_fn(apply_augmentations(wav, aug, key)))

    return run_plain, run_augmented


def extract_feature_array(
    df: pd.DataFrame,
    feature_fn: Callable,
    *,
    sr: int = 16000,
    batch_size: int = 256,
    path_col: str = "file_path",
    aug_col: str = "augmentationType",
    mean: bool = False,
    time_axis: int = -1,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """((len(df), ...) features, (len(df),) ok-mask), batched through the
    device. Rows whose audio could not be decoded carry zero features and
    ``ok=False`` — the reference's failure->None policy, applied by
    ``extract_features`` as None cells for ``filtr_nan`` to drop.

    With multiple local devices, full batches are sharded over the batch
    axis (``_batch_sharding``) and extraction runs data-parallel."""
    paths = df[path_col].tolist()
    starts = df.get("chunk_start", pd.Series([0.0] * len(df))).tolist()
    ends = df.get("chunk_end", pd.Series([2.0] * len(df))).tolist()
    codes = _aug_codes_from(df, aug_col)
    sharding = _batch_sharding(batch_size)

    run_plain, run_augmented = _jitted_runners(feature_fn, mean, time_axis)
    key = jax.random.PRNGKey(seed)
    outs, oks = [], []
    for lo in range(0, len(paths), batch_size):
        hi = min(lo + batch_size, len(paths))
        true = hi - lo
        wav, ok = load_chunk_batch(
            paths[lo:hi], starts[lo:hi], ends[lo:hi], sr=sr, return_ok=True
        )
        if true < batch_size:
            wav = np.concatenate(
                [wav, np.zeros((batch_size - true,) + wav.shape[1:], np.float32)]
            )
        aug = np.zeros(batch_size, np.int32)
        aug[:true] = codes[lo:hi]
        wav_dev = (
            jax.device_put(wav, sharding) if sharding is not None else jnp.asarray(wav)
        )
        if aug.any():
            key, sub = jax.random.split(key)
            aug_dev = (
                jax.device_put(aug, sharding) if sharding is not None else jnp.asarray(aug)
            )
            feats = run_augmented(wav_dev, aug_dev, sub)
        else:
            feats = run_plain(wav_dev)
        outs.append(np.asarray(feats)[:true])
        oks.append(ok)
    if not outs:
        return np.empty((0,)), np.empty((0,), bool)
    return np.concatenate(outs), np.concatenate(oks)


def extract_features(
    df: pd.DataFrame,
    feature_extractors_map: dict[str, Callable] | list[str],
    *,
    sr: int = 16000,
    batch_size: int = 256,
    col_name: str = "file_path",
    aug_col: str = "augmentationType",
    mean: bool = False,
    seed: int = 0,
) -> pd.DataFrame:
    """Reference ``extract_features`` contract: adds one column per feature,
    each cell an ndarray (reference/ASV_dl_func.py:1031-1049)."""
    if isinstance(feature_extractors_map, list):
        registry = default_extractors(sr)
        feature_extractors_map = {
            n: (FORMANTS_FEATURE if n == FORMANTS_FEATURE else registry[n])
            for n in feature_extractors_map
        }
    if mean and "mfcc_deltas" in feature_extractors_map:
        raise ValueError(
            "mfcc_deltas is CMVN-normalized per utterance: its time mean is "
            "identically zero, so mean=True pooling would yield all-zero "
            "features — pool plain 'mfcc' instead"
        )
    df = df.copy()
    for name, fn in feature_extractors_map.items():
        # the host formants path routes by VALUE (the sentinel) or by a
        # non-callable under the name; a user-supplied callable mapped as
        # "formants" is honored as a device extractor, not silently swapped
        if fn is FORMANTS_FEATURE or (name == FORMANTS_FEATURE and not callable(fn)):
            df[name] = _extract_formants_cells(
                df, sr=sr, batch_size=batch_size, path_col=col_name
            )
            continue
        arr, ok = extract_feature_array(
            df, fn, sr=sr, batch_size=batch_size, path_col=col_name,
            aug_col=aug_col, mean=mean, seed=seed,
            time_axis=-2 if name in TIME_MAJOR_FEATURES else -1,
        )
        # failed rows become None cells (reference error policy, §2.1) so
        # data.filtr_nan drops them downstream
        df[name] = [a if good else None for a, good in zip(arr, ok)]
    return df
