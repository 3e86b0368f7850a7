"""CLI smoke tests on a synthetic labeled WAV corpus (CPU)."""

import json
import os

import numpy as np
import pytest

from audioanalysisdetector_tpu.cli.main import main
from audioanalysisdetector_tpu.io.audio import write_wav


@pytest.fixture
def corpus(tmp_path, rng):
    for label in ("bonafide", "spoof"):
        d = tmp_path / "wavs" / label
        d.mkdir(parents=True)
        for i in range(6):
            y = rng.standard_normal(32000).astype(np.float32) * 0.1
            if label == "spoof":
                y += 0.05 * np.sin(2 * np.pi * 3000 * np.arange(32000) / 16000)
            write_wav(str(d / f"{label}_{i}.wav"), y, 16000)
    return str(tmp_path / "wavs")


def test_cli_train_mostly_corrupt_corpus_fails_cleanly(tmp_path, rng, capsys):
    """Decode failures must produce the 'need at least N' message, not an
    opaque shape crash deep in fit/evaluate: the pre-decode count check
    passes, then unreadable files shrink the corpus below the minimum."""
    for label in ("bonafide", "spoof"):
        d = tmp_path / "wavs" / label
        d.mkdir(parents=True)
        for i in range(3):
            p = d / f"{label}_{i}.wav"
            write_wav(str(p), rng.standard_normal(32000).astype(np.float32) * 0.1, 16000)
            if i > 0:  # keep one good file per class, corrupt the rest
                raw = bytearray(p.read_bytes())
                raw[:4] = b"XXXX"
                p.write_bytes(bytes(raw))
    rc = main(["train", str(tmp_path / "wavs"), "--epochs", "1"])
    assert rc == 1
    assert "decoded successfully" in capsys.readouterr().err


def test_cli_score_refuses_random_weights(corpus, capsys):
    """Without a checkpoint the scorer would emit authoritative-looking
    nonsense from random init (round-1 review Weak #4) — it must refuse."""
    assert main(["score", corpus]) == 2
    assert "--allow-random" in capsys.readouterr().err


def test_cli_score(corpus, capsys):
    assert main(["score", corpus, "--allow-random"]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 12
    assert all(0.0 <= l["spoof_score"] <= 1.0 for l in lines)


def test_cli_score_streams_mixed_corpus(corpus, capsys):
    """Streaming path: FLAC + WAV mixed, batch smaller than the corpus (a
    ragged tail batch gets padded), unreadable files skipped with a warning."""
    from audioanalysisdetector_tpu.io.flac import write_flac

    rng = np.random.default_rng(7)
    for i in range(3):
        x = np.round(
            np.clip(rng.standard_normal(32000) * 0.05, -0.999, 0.999) * 32767
        ).astype(np.int64)
        write_flac(os.path.join(corpus, f"extra_{i}.flac"), x, 16000)
    with open(os.path.join(corpus, "broken.wav"), "wb") as f:
        f.write(b"not audio")
    assert main(["score", corpus, "--allow-random", "--batch-size", "4"]) == 0
    captured = capsys.readouterr()
    lines = [json.loads(l) for l in captured.out.strip().splitlines()]
    assert len(lines) == 15  # 12 wav + 3 flac; broken dropped
    assert any(l["file"].endswith(".flac") for l in lines)
    assert "broken.wav" in captured.err


def test_stream_producer_dies_with_consumer(corpus):
    """Abandoning (or erroring out of) the consumer loop must not leave the
    producer thread parked on a full queue (round-2 review Weak #5)."""
    import glob
    import threading
    import time

    from audioanalysisdetector_tpu.score.streaming import stream_decode_batches

    paths = sorted(glob.glob(os.path.join(corpus, "**", "*.wav"), recursive=True))
    assert len(paths) >= 8
    before = set(threading.enumerate())

    # (a) consumer abandons the generator after one batch
    gen = stream_decode_batches(paths, seconds=2.0, sr=16000, batch_size=2)
    next(gen)
    gen.close()

    # (b) consumer raises mid-iteration
    def raising_consumer():
        for _ in stream_decode_batches(paths, seconds=2.0, sr=16000, batch_size=2):
            raise RuntimeError("scorer blew up")

    with pytest.raises(RuntimeError, match="scorer blew up"):
        raising_consumer()

    deadline = time.time() + 10
    while time.time() < deadline:
        leftover = [t for t in threading.enumerate() if t not in before and t.is_alive()]
        if not leftover:
            break
        time.sleep(0.05)
    assert not leftover, f"producer threads leaked: {leftover}"


def test_cli_extract_no_decodable_files(tmp_path, capsys):
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "junk.wav").write_bytes(b"not audio at all")
    rc = main(["extract", str(bad), "--feature", "mfcc",
               "--output", str(tmp_path / "out.npz")])
    assert rc == 1
    assert "no decodable" in capsys.readouterr().err


def test_cli_extract(corpus, tmp_path, capsys):
    out = str(tmp_path / "feats.npz")
    assert main(["extract", corpus, "--feature", "cqcc", "--output", out]) == 0
    with np.load(out) as z:
        assert z["features"].shape == (12, 19, 63)


def test_cli_augment(corpus, tmp_path):
    out_dir = str(tmp_path / "aug")
    assert main(["augment", corpus, "--output-dir", out_dir]) == 0
    assert len(os.listdir(out_dir)) == 36


def test_cli_train(corpus, tmp_path, capsys):
    assert (
        main(
            ["train", corpus, "--epochs", "1", "--batch-size", "4",
             "--run-dir", str(tmp_path / "run")]
        )
        == 0
    )
    out = capsys.readouterr().out.strip().splitlines()
    metrics = json.loads(out[-1])
    assert {"accuracy", "f1", "eer", "loss"} <= set(metrics)


def test_cli_xai(corpus, tmp_path, capsys):
    out_dir = str(tmp_path / "xai")
    assert main(["xai", corpus, "--output-dir", out_dir]) == 0
    files = os.listdir(out_dir)
    assert any("saliency" in f for f in files) and any("grad_cam" in f for f in files)


def test_cli_train_fused(corpus, tmp_path, capsys):
    assert (
        main(
            ["train-fused", corpus, "--epochs", "1", "--batch-size", "4",
             "--hidden", "8", "--gmm-components", "2",
             "--run-dir", str(tmp_path / "fused")]
        )
        == 0
    )
    out = capsys.readouterr().out.strip().splitlines()
    metrics = json.loads(out[-1])
    assert "fused" in metrics and "eer" in metrics["fused"]


def test_cli_train_then_score_checkpoint(corpus, tmp_path, capsys):
    """Regression: score --checkpoint must load fit()-produced checkpoints."""
    run_dir = str(tmp_path / "run")
    assert main(["train", corpus, "--epochs", "1", "--batch-size", "4",
                 "--run-dir", run_dir]) == 0
    capsys.readouterr()
    ckpt = os.path.join(run_dir, "best_model.msgpack")
    assert os.path.exists(ckpt)
    assert main(["score", corpus, "--checkpoint", ckpt]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 12


def test_cli_xai_all_methods(corpus, tmp_path, capsys):
    out_dir = str(tmp_path / "xai_all")
    assert main([
        "xai", corpus, "--output-dir", out_dir,
        "--methods", "saliency,gradcam,ig,occlusion,lime",
        "--ig-steps", "4", "--lime-perturbations", "8",
    ]) == 0
    files = os.listdir(out_dir)
    for name in ("saliency", "grad_cam", "integrated_gradients", "occlusion"):
        assert any(name in f for f in files), (name, files)
    out = capsys.readouterr().out
    assert "lime_top_components" in out


def test_cli_xai_html_report(corpus, tmp_path, capsys):
    out_dir = str(tmp_path / "xai_html")
    assert main(["xai", corpus, "--output-dir", out_dir, "--html"]) == 0
    html_path = os.path.join(out_dir, "explanation.html")
    assert os.path.exists(html_path)
    doc = open(html_path).read()
    assert "data:image/png;base64," in doc and "score" in doc


def test_cli_speech_mel_profile_train_then_score(corpus, tmp_path, capsys):
    """--mel-profile speech must carry consistently from train to score
    (32 ms/16 ms resolution; frontend.mel.MelConfig.for_speech)."""
    run_dir = str(tmp_path / "run")
    assert main(["train", corpus, "--epochs", "1", "--batch-size", "4",
                 "--mel-profile", "speech", "--run-dir", run_dir]) == 0
    capsys.readouterr()
    ckpt = os.path.join(run_dir, "best_model.msgpack")
    assert main(["score", corpus, "--checkpoint", ckpt,
                 "--mel-profile", "speech"]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 12


def test_cli_train_3features(corpus, tmp_path, capsys):
    rc = main(["train-3features", corpus, "--epochs", "1", "--batch-size", "4",
               "--run-dir", str(tmp_path / "mf")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {"accuracy", "f1", "eer"} <= set(out)
    assert os.path.exists(tmp_path / "mf" / "metrics.json")


def test_cli_train_mfca(corpus, tmp_path, capsys):
    rc = main(["train-mfca", corpus, "--epochs", "1", "--batch-size", "4",
               "--run-dir", str(tmp_path / "mfca")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {"accuracy", "f1", "eer"} <= set(out)


def test_cli_classical(tmp_path, capsys):
    """The metadata-driven classical command end-to-end on a tiny surrogate
    corpus (reference/train_fun.py:305-403 equivalent)."""
    from audioanalysisdetector_tpu.data.synthetic import make_surrogate_corpus

    meta, flac_dir = make_surrogate_corpus(
        str(tmp_path / "c"), n_bonafide=8, n_spoof_per_tier=3,
        seconds=1.5, seed=5, subset="train",
    )
    rc = main([
        "classical", "--dataset", f"LA:{meta}:{flac_dir}",
        "--seconds", "1.5", "--features", "wpt,formants",
        "--components", "4", "--cache-dir", str(tmp_path / "cache"),
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {"svm", "xgb"} <= set(out)


def test_cli_classical_config_yaml(tmp_path, capsys):
    """--config consumes the reference-style datasets.{KEY} YAML block
    (reference/train_fun.py:30-44)."""
    from audioanalysisdetector_tpu.data.synthetic import make_surrogate_corpus

    meta, flac_dir = make_surrogate_corpus(
        str(tmp_path / "c"), n_bonafide=8, n_spoof_per_tier=3,
        seconds=1.5, seed=6, subset="train",
    )
    cfg = tmp_path / "config.yaml"
    cfg.write_text(
        f"datasets:\n  LA:\n    metadata: {meta}\n    flac: [{flac_dir}]\n"
    )
    rc = main([
        "classical", "--config", str(cfg),
        "--seconds", "1.5", "--features", "wpt", "--components", "4",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {"svm", "xgb"} <= set(out)


@pytest.mark.slow
def test_cli_gridsearch_full_space(tmp_path, rng, capsys):
    """Drive the CLI through >= 2 feature sets and the reference's full
    reducer x components space (round-1 review Weak #5). Component counts
    exceeding the feature dimensionality or sample count are skipped
    per-combo like the reference (reference/ASV_dl_func.py:1691-1693)."""
    for label in ("bonafide", "spoof"):
        d = tmp_path / "wavs" / label
        d.mkdir(parents=True)
        for i in range(30):
            y = rng.standard_normal(32000).astype(np.float32) * 0.1
            if label == "spoof":
                y += 0.05 * np.sin(2 * np.pi * 3000 * np.arange(32000) / 16000)
            write_wav(str(d / f"{label}_{i}.wav"), y, 16000)
    corpus = str(tmp_path / "wavs")
    out_dir = str(tmp_path / "gs")
    assert main([
        "gridsearch", corpus, "--output-dir", out_dir,
        "--features", "wpt,mfcc", "--components", "10,20,30,40",
    ]) == 0
    printed = capsys.readouterr().out
    assert "test_score" in printed
    import pandas as pd
    summary = pd.read_csv(os.path.join(out_dir, "gridsearch_summary.csv"))
    # feature sets: {wpt}, {mfcc}, {wpt, mfcc}; reducers None/PCA/ICA;
    # std on/off; SVM+XGB -> a real sweep, not a token slice
    assert summary["feature_set"].nunique() >= 3
    assert summary["model"].nunique() == 2
    assert summary["reducer"].nunique() >= 2


def test_cli_serve_parses_adaptive_flag(capsys):
    """`serve --no-adaptive` must parse (flag plumbed through to the
    batcher) and still refuse random weights before binding a socket."""
    assert main(["serve", "--no-adaptive"]) == 2
    assert "--allow-random" in capsys.readouterr().err


def test_cli_train_asvspoof_on_la_layout_fixture(tmp_path, capsys):
    """The real-LA bridge, rehearsed file-format-down (round-4 verdict #8):
    a miniature ASVspoof-LA-layout tree (real metadata column format,
    in-repo FLAC files) through the FULL ``train-asvspoof`` CLI — the one
    command that validates the quality north star when real LA data is
    mounted. Asserts the JSON output contract (per-arm metrics, fused
    per-tier EER decomposition, calibration block) and the persisted run
    artifacts (scaler, BiLSTM checkpoint, the three GMMs)."""
    import glob

    from audioanalysisdetector_tpu.data.synthetic import make_surrogate_corpus

    tr_meta, tr_dir = make_surrogate_corpus(
        str(tmp_path / "train"), n_bonafide=6, n_spoof_per_tier=2,
        seconds=2.5, seed=0, subset="train",
    )
    ev_meta, ev_dir = make_surrogate_corpus(
        str(tmp_path / "eval"), n_bonafide=6, n_spoof_per_tier=2,
        seconds=2.5, seed=1, subset="eval",
    )
    run_dir = str(tmp_path / "run")
    assert main([
        "train-asvspoof", tr_meta, ev_meta, "--audio-dir", tr_dir, ev_dir,
        "--epochs", "2", "--hidden", "8", "--gmm-components", "4",
        "--batch-size", "8", "--run-dir", run_dir,
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for arm in ("bilstm", "gmm", "fused"):
        assert "eer" in out[arm], out
    assert set(out["fused"]["per_tier_eer"]) == {"A01", "A02", "A03"}
    assert {"scale", "bias", "weight"} <= set(out["calibration"])
    assert out["n_train"] == 12 and out["n_eval"] == 12
    # persisted artifacts: the deployment contract of the run directory
    assert os.path.exists(os.path.join(run_dir, "scaler.npz"))
    for gmm in ("ubm", "gmm_genuine", "gmm_df"):
        assert os.path.exists(os.path.join(run_dir, f"{gmm}.npz")), gmm
    assert glob.glob(os.path.join(run_dir, "**", "best_model.msgpack"),
                     recursive=True)
