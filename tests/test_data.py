"""Data-layer tests on synthetic WAV corpora."""

import os

import numpy as np
import pandas as pd
import pytest

from audioanalysisdetector_tpu.data import (
    FrameScaler,
    add_data_augmentation,
    balance_downsample,
    balance_upsample,
    chunk_rows,
    detect_columns,
    extract_features,
    filtr_nan,
    prepare_dataframe,
    prepare_dirs_dataset,
    prepare_filepaths,
    prepare_train_test_data,
    read_metadata,
)
from audioanalysisdetector_tpu.io.audio import audio_info, load_audio, write_wav
from audioanalysisdetector_tpu.io.config import DEFAULT_COLUMNS, loads_config


@pytest.fixture
def corpus(tmp_path, rng):
    """Tiny WAV corpus + LA-schema metadata file."""
    audio_dir = tmp_path / "flac"
    audio_dir.mkdir()
    lines = []
    for i in range(6):
        fid = f"LA_E_{i:07d}"
        dur = 4.5 if i < 4 else 1.0  # two files too short to chunk
        y = rng.standard_normal(int(16000 * dur)).astype(np.float32) * 0.1
        write_wav(str(audio_dir / f"{fid}.wav"), y, 16000)
        label = "bonafide" if i % 2 == 0 else "spoof"
        lines.append(f"LA_0001 {fid} nocodec asvspoof A0{i % 3} {label} notrim eval")
    meta = tmp_path / "metadata.txt"
    meta.write_text("\n".join(lines) + "\n")
    return tmp_path, str(meta), str(audio_dir)


def test_wav_io_round_trip(tmp_path, rng):
    y = np.clip(rng.standard_normal(8000) * 0.3, -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, y, 16000)
    info = audio_info(p)
    assert (info.frames, info.samplerate, info.channels) == (8000, 16000, 1)
    y2, sr = load_audio(p)
    assert sr == 16000
    # writer scales by 32767, reader by 32768 (librosa convention) + quantization
    np.testing.assert_allclose(y2, y, atol=1e-4)


def test_load_audio_offset_duration_resample(tmp_path, rng):
    y = np.clip(rng.standard_normal(32000) * 0.3, -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, y, 16000)
    seg, sr = load_audio(p, offset=0.5, duration=1.0)
    assert len(seg) == 16000
    np.testing.assert_allclose(seg, y[8000:24000], atol=1e-4)
    res, sr2 = load_audio(p, sr=8000)
    assert sr2 == 8000 and len(res) == 16000


def test_detect_columns_and_read(corpus):
    _, meta, _ = corpus
    cols = detect_columns(meta)
    assert cols == DEFAULT_COLUMNS["LA"]  # 8 columns -> LA schema
    df = read_metadata(meta)
    assert list(df.columns) == cols and len(df) == 6


def test_prepare_filepaths_filters_missing(corpus):
    _, meta, audio_dir = corpus
    df = read_metadata(meta)
    df.loc[len(df)] = df.iloc[0]
    df.loc[len(df) - 1, "file_id"] = "LA_E_MISSING"
    out = prepare_filepaths(df, audio_dir, extension=".wav")
    assert len(out) == 6
    assert all(os.path.exists(p) for p in out["file_path"])


def test_chunk_rows_skips_short(corpus):
    _, meta, audio_dir = corpus
    df = prepare_filepaths(read_metadata(meta), audio_dir, extension=".wav")
    chunks = chunk_rows(df, verbose=False)
    # 4 long files x 2 full 2-s chunks each; short files skipped
    assert len(chunks) == 8
    assert set(chunks["chunk_index"]) == {0, 1}
    assert (chunks["chunk_end"] - chunks["chunk_start"] == 2.0).all()


def test_prepare_dataframe_end_to_end(corpus):
    base, meta, audio_dir = corpus
    all_data = {"LA": {"metadata": meta, "flac": [audio_dir]}}
    df = prepare_dataframe(
        all_data, balance=True, min_per_class=2, sample_size=None,
        extension=".wav", rescue_dir=str(base),
    )
    assert not df.empty
    counts = df["label"].value_counts()
    assert counts["bonafide"] == counts["spoof"]
    assert (base / "LA_ratunkowe.csv").exists()


def test_prepare_dirs_dataset(tmp_path, rng):
    for subset, n in (("train", 3), ("test", 2)):
        for label in ("real", "fake"):
            d = tmp_path / "wild" / subset / label
            d.mkdir(parents=True)
            for i in range(n):
                write_wav(
                    str(d / f"{i}.wav"),
                    rng.standard_normal(16000 * 4).astype(np.float32) * 0.1,
                    16000,
                )
    dfs = prepare_dirs_dataset(
        str(tmp_path / "wild"), min_per_class={"train": 1, "test": 1},
        rescue_dir=str(tmp_path),
    )
    assert len(dfs) == 2
    for df in dfs:
        assert set(df["label"]) == {"real", "fake"}


def test_extract_features_dataframe_contract(corpus):
    _, meta, audio_dir = corpus
    df = chunk_rows(
        prepare_filepaths(read_metadata(meta), audio_dir, extension=".wav"),
        verbose=False,
    )
    out = extract_features(df, ["cqcc", "wpt"], batch_size=4)
    assert out["cqcc"].iloc[0].shape == (19, 63)  # the shape contract
    assert out["wpt"].iloc[0].shape == (8,)
    assert len(out) == len(df)


def test_extract_features_sharded_matches_single_device(corpus):
    """Batch-sharded extraction over the 8-virtual-device mesh must equal
    the single-device result exactly (featurization is per-row; input
    sharding makes it SPMD with no collectives — data/pipeline.py)."""
    import jax

    from audioanalysisdetector_tpu.data.pipeline import _batch_sharding

    _, meta, audio_dir = corpus
    df = chunk_rows(
        prepare_filepaths(read_metadata(meta), audio_dir, extension=".wav"),
        verbose=False,
    )
    assert jax.local_device_count() == 8
    assert _batch_sharding(8) is not None  # divisible -> sharded path
    assert _batch_sharding(6) is None  # not divisible -> single-device
    sharded = extract_features(df, ["mfcc"], batch_size=8)
    plain = extract_features(df, ["mfcc"], batch_size=7)  # 7 % 8 != 0
    for a, b in zip(sharded["mfcc"], plain["mfcc"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_balance_funcs(rng):
    df = pd.DataFrame({"label_num": [0] * 10 + [1] * 4, "v": range(14)})
    up = balance_upsample(df)
    assert (up["label_num"] == 0).sum() == (up["label_num"] == 1).sum() == 10
    down = balance_downsample(df)
    assert (down["label_num"] == 0).sum() == (down["label_num"] == 1).sum() == 4
    df2 = pd.DataFrame({"cqcc": [np.ones(3), None, np.ones(3)]})
    assert len(filtr_nan(df2)) == 2


def test_add_data_augmentation_policy():
    df = pd.DataFrame({"x": range(400)})
    out = add_data_augmentation(df, seed=0)
    added = len(out) - len(df)
    # E[added] = 0.8 + 0.5*2 = 1.8 per row
    assert 1.5 * len(df) < added < 2.1 * len(df)
    assert out["augmentationType"].dropna().isin(["change pitch", "noise"]).all()
    assert out["augmentationType"][: len(df)].isna().all()


def test_frame_scaler_round_trip(tmp_path, rng):
    seqs = rng.standard_normal((20, 63, 19)).astype(np.float32) * 3 + 1
    tr, te, scaler = prepare_train_test_data(
        seqs, seqs[:5], scaler_path=str(tmp_path / "scaler.npz")
    )
    flat = tr.reshape(-1, 19)
    np.testing.assert_allclose(flat.mean(0), 0, atol=1e-4)
    np.testing.assert_allclose(flat.std(0), 1, atol=1e-3)
    loaded = FrameScaler.load(str(tmp_path / "scaler.npz"))
    np.testing.assert_array_equal(loaded.mean, scaler.mean)


def test_config_env_resolver(monkeypatch):
    monkeypatch.setenv("MYVAR", "/real/path")
    cfg = loads_config("paths:\n  a: ${env:MYVAR,/default}\n  b: ${env:UNSET_VAR,/default}\n")
    assert cfg.paths.a == "/real/path"
    assert cfg.paths.b == "/default"


def test_mfcc_deltas_registry_and_mean_guard(corpus):
    _, meta, audio_dir = corpus
    df = chunk_rows(
        prepare_filepaths(read_metadata(meta), audio_dir, extension=".wav"),
        verbose=False,
    )
    out = extract_features(df.iloc[:4], ["mfcc_deltas"], batch_size=4)
    assert out["mfcc_deltas"].iloc[0].shape == (39, 63)
    # CMVN makes time means zero -> mean pooling must refuse loudly
    with pytest.raises(ValueError, match="mean"):
        extract_features(df.iloc[:4], ["mfcc_deltas"], batch_size=4, mean=True)


def test_prepare_dataframe_flac_tree_end_to_end(tmp_path, rng):
    """The reference's actual corpus format: ASVspoof FLAC trees with default
    .flac extension (reference/ASV_dl_func.py:63-75, :406)."""
    from audioanalysisdetector_tpu.io import load_chunk_batch_native
    from audioanalysisdetector_tpu.io.flac import write_flac

    audio_dir = tmp_path / "flac"
    audio_dir.mkdir()
    lines = []
    for i in range(4):
        fid = f"LA_E_{i:07d}"
        y = rng.standard_normal(16000 * 3) * 0.1
        x = np.round(np.clip(y, -0.99, 0.99) * 32767).astype(np.int64)
        write_flac(str(audio_dir / f"{fid}.flac"), x, 16000)
        label = "bonafide" if i % 2 == 0 else "spoof"
        lines.append(f"LA_0001 {fid} nocodec asvspoof A0{i % 3} {label} notrim eval")
    meta = tmp_path / "metadata.txt"
    meta.write_text("\n".join(lines) + "\n")

    all_data = {"LA": {"metadata": str(meta), "flac": [str(audio_dir)]}}
    df = prepare_dataframe(
        all_data, balance=False, sample_size=None, rescue_dir=str(tmp_path)
    )
    assert len(df) == 4  # one 2-s chunk per 3-s file
    assert df["file_path"].str.endswith(".flac").all()

    wavs = load_chunk_batch_native(
        df["file_path"].tolist(), df["chunk_start"].tolist(),
        df["chunk_end"].tolist(), sr=16000,
    )
    assert wavs.shape == (4, 32000)
    assert np.abs(wavs).max() > 0.01

    out = extract_features(df, ["cqcc"], batch_size=4)
    assert out["cqcc"].iloc[0].shape == (19, 63)


def test_mean_pooling_reduces_time_for_time_major_features(corpus):
    """lfcc/gtcc keep the spafe (T, n_ceps) layout, so mean=True must pool
    the TIME axis (axis -2) — the reference's classical path expects 13-dim
    time-mean cepstra (reference/train_fun.py:85-88), not per-frame
    coefficient averages whose length depends on the clip duration."""
    base, meta, audio_dir = corpus
    all_data = {"LA": {"metadata": meta, "flac": [audio_dir]}}
    df = prepare_dataframe(
        all_data, balance=False, sample_size=None, extension=".wav",
        rescue_dir=None,
    )
    out = extract_features(df.head(3), ["lfcc", "gtcc", "mfcc"], mean=True)
    assert np.asarray(out["lfcc"].iloc[0]).shape == (13,)
    assert np.asarray(out["gtcc"].iloc[0]).shape == (13,)
    assert np.asarray(out["mfcc"].iloc[0]).shape == (13,)
