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
    for x, ls, y in bucketed_batches(seqs, labels, 8, n_buckets=3, seed=1):
        shapes.add(x.shape[1])
        assert x.shape[0] == 8 and len(ls) == 8 and len(y) == 8
        assert (ls <= x.shape[1]).all()
        seen += 8
    assert len(shapes) <= 3  # at most one shape per bucket
    assert seen >= len(seqs)


def test_padding_is_zero_and_mask_recovers_lengths(rng):
    seqs, labels = _ragged_corpus(rng)
    for x, ls, y in bucketed_batches(seqs, labels, 4, n_buckets=2, shuffle=False):
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
    for x, ls, y in bucketed_batches(marked, labels, 5, n_buckets=3, seed=2):
        tags.update(np.round(x[:, 0, 0]).astype(int).tolist())
    assert tags == {1000 + i for i in range(23)}
