"""Length-bucketing tests: shape ladder, padding semantics, mask recovery."""

import numpy as np
import jax.numpy as jnp

from audioanalysisdetector_tpu.data.bucketing import (
    bucket_for,
    bucketed_batches,
    make_bucket_ladder,
)
from audioanalysisdetector_tpu.score.fused import padding_mask


def _ragged_corpus(rng, n=50, fdim=5):
    lengths = rng.integers(10, 100, n)
    seqs = [rng.standard_normal((l, fdim)).astype(np.float32) + 1.0 for l in lengths]
    labels = rng.integers(0, 2, n)
    return seqs, labels


def test_ladder_and_assignment(rng):
    lengths = rng.integers(10, 100, 200)
    ladder = make_bucket_ladder(lengths, n_buckets=4)
    assert ladder == sorted(ladder)
    assert ladder[-1] >= lengths.max()
    for l in lengths:
        b = bucket_for(int(l), ladder)
        assert b >= l


def test_bucketed_batches_static_shapes(rng):
    seqs, labels = _ragged_corpus(rng)
    shapes = set()
    seen = 0
    for x, ls, y, n_true in bucketed_batches(seqs, labels, 8, n_buckets=3, seed=1):
        shapes.add(x.shape[1])
        assert x.shape[0] == 8 and len(ls) == 8 and len(y) == 8
        assert 1 <= n_true <= 8
        assert (ls <= x.shape[1]).all()
        seen += n_true
    assert len(shapes) <= 3  # at most one shape per bucket
    assert seen == len(seqs)  # n_true counts each sequence exactly once


def test_padding_is_zero_and_mask_recovers_lengths(rng):
    seqs, labels = _ragged_corpus(rng)
    for x, ls, y, _n_true in bucketed_batches(seqs, labels, 4, n_buckets=2, shuffle=False):
        mask = np.asarray(padding_mask(jnp.asarray(x)))
        np.testing.assert_array_equal(mask.sum(axis=1), ls)
        for j in range(len(ls)):
            assert (x[j, ls[j]:] == 0).all()


def test_every_sequence_appears(rng):
    seqs, labels = _ragged_corpus(rng, n=23)
    marked = [s.copy() for s in seqs]
    for i, s in enumerate(marked):
        s[0, 0] = 1000.0 + i  # tag each sequence
    tags = set()
    for x, ls, y, _n_true in bucketed_batches(marked, labels, 5, n_buckets=3, seed=2):
        tags.update(np.round(x[:, 0, 0]).astype(int).tolist())
    assert tags == {1000 + i for i in range(23)}


def test_fit_bucketed_ragged_cqcc_end_to_end(rng):
    """Train on a ragged CQCC corpus (1.2 s .. 4 s) through the bucketed
    path; the jit cache must hold at most len(ladder) shapes and the
    bucketing must preserve mask semantics through the fused scorer
    (BASELINE config #4; replaces reference/ASV_dl_func.py:1220-1227)."""
    import jax
    from audioanalysisdetector_tpu.frontend.cqcc import CQCCConfig, cqcc, transpose_cqcc
    from audioanalysisdetector_tpu.models.bilstm_classifier import BiLSTMClassifier
    from audioanalysisdetector_tpu.train import fit_bucketed

    sr = 16000
    cfg = CQCCConfig.for_sr(sr)
    durations = [1.2, 1.7, 2.0, 2.6, 3.1, 4.0]
    seqs, labels = [], []
    for d in durations:
        n = int(sr * d)
        t = np.arange(n) / sr
        # 4 utterances per length: 2 tonal (bonafide-like), 2 noise (spoof-like)
        wavs = np.stack(
            [0.5 * np.sin(2 * np.pi * (220 + 30 * k) * t) for k in range(2)]
            + [0.3 * rng.standard_normal(n) for _ in range(2)]
        ).astype(np.float32)
        feats = np.asarray(transpose_cqcc(cqcc(jnp.asarray(wavs), cfg)))
        for k in range(4):
            seqs.append(feats[k])
            labels.append(0 if k < 2 else 1)
    labels = np.asarray(labels)
    tr_idx = [i for i in range(len(seqs)) if i % 4 != 3]
    va_idx = [i for i in range(len(seqs)) if i % 4 == 3]

    import tempfile

    model = BiLSTMClassifier(hidden=16)
    run_dir = tempfile.mkdtemp(prefix="bucketed_run_")
    result = fit_bucketed(
        model,
        [seqs[i] for i in tr_idx], labels[tr_idx],
        [seqs[i] for i in va_idx], labels[va_idx],
        num_epochs=8, batch_size=6, n_buckets=3, lr=5e-3, seed=0,
        run_dir=run_dir, plots=False,
    )
    # same artifact contract as fit() (round-2 review Weak #4;
    # reference/ASV_dl_func.py:1332-1382)
    import os
    for artifact in ("best_model.msgpack", "worst_model.msgpack",
                     "final_model.msgpack", "training_log.csv",
                     "training_log.txt", "logs.json"):
        assert os.path.exists(os.path.join(run_dir, artifact)), artifact
    ladder = make_bucket_ladder(
        np.asarray([len(s) for s in seqs]), n_buckets=3
    )
    assert result.n_compiled_shapes <= len(ladder), (
        result.n_compiled_shapes, ladder,
    )
    assert result.logs[-1].train_acc > 0.85, result.logs[-1]

    # mask semantics: a bucketed (padded) sequence must score exactly like
    # the unpadded sequence — logits read the true last step, and the GMM
    # mask drops zero rows (reference/ASV_dl_func.py:1486-1489)
    variables = {"params": result.best_state.params}
    s = seqs[0]
    bucket_len = bucket_for(len(s), ladder)
    padded = np.zeros((1, bucket_len, s.shape[-1]), np.float32)
    padded[0, : len(s)] = s
    lengths = np.asarray([len(s)], np.int32)
    out_pad = model.apply(variables, jnp.asarray(padded), lengths=jnp.asarray(lengths))
    out_raw = model.apply(variables, jnp.asarray(s[None]))
    np.testing.assert_allclose(np.asarray(out_pad), np.asarray(out_raw), atol=1e-5)

    mask = np.asarray(padding_mask(jnp.asarray(padded)))
    assert mask[0, : len(s)].all() and not mask[0, len(s):].any()


def test_small_bucket_fills_to_batch_size(rng):
    """A bucket smaller than one batch must cyclically tile to EXACTLY
    batch_size rows — a short batch would add an extra compiled shape and
    break the <= len(ladder) invariant."""
    seqs = [rng.standard_normal((12, 5)).astype(np.float32) for _ in range(3)]
    labels = np.arange(3)
    batches = list(bucketed_batches(seqs, labels, 16, n_buckets=1, shuffle=False))
    assert len(batches) == 1
    x, ls, y, n_true = batches[0]
    assert x.shape[0] == 16 and n_true == 3
    # the tail repeats cycle over the bucket's real rows
    np.testing.assert_array_equal(y[:3], labels)
    np.testing.assert_array_equal(y[3:6], labels)


def test_batch_order_shuffled_across_buckets(rng):
    """With shuffle=True the epoch's batch ORDER must mix buckets — a fixed
    short->long schedule is a length curriculum the reference's fully
    shuffled collate does not have."""
    seqs, labels = _ragged_corpus(rng, n=64)
    lens = [
        x.shape[1]
        for x, *_ in bucketed_batches(seqs, labels, 4, n_buckets=4, seed=3)
    ]
    assert len(set(lens)) > 1
    assert lens != sorted(lens)
