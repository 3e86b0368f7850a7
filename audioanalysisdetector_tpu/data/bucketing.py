"""Length bucketing — static-shape batching for variable-length corpora.

The reference pads every batch to its longest sequence at collate time
(``collate_fn_padd``, reference/ASV_dl_func.py:1220-1227), which under XLA
would compile one program per distinct batch length. Bucketing quantizes
lengths to a small fixed ladder instead: each sequence goes to the smallest
bucket that fits, batches form within a bucket, and the compiler sees only
``len(buckets)`` shapes (BASELINE config #4's "length-bucketed batches").

Padding semantics match the scorer's mask contract: padded frames are zero,
recovered downstream by ``score.padding_mask`` / masked losses.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Iterator

import numpy as np


def make_bucket_ladder(lengths: np.ndarray, n_buckets: int = 4) -> list[int]:
    """Quantile-based bucket boundaries covering all observed lengths."""
    qs = np.quantile(np.asarray(lengths), np.linspace(0, 1, n_buckets + 1)[1:])
    ladder = sorted(set(int(np.ceil(q)) for q in qs))
    if ladder[-1] < max(lengths):
        ladder[-1] = int(max(lengths))
    return ladder


def bucket_for(length: int, ladder: list[int]) -> int:
    """Smallest bucket length that fits; the top bucket catches the rest."""
    for b in ladder:
        if length <= b:
            return b
    return ladder[-1]


def bucketed_batches(
    sequences: list[np.ndarray],
    labels: np.ndarray,
    batch_size: int,
    *,
    ladder: list[int] | None = None,
    n_buckets: int = 4,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = False,
) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Yield (x (B, T_bucket, F), lengths (B,), y (B,)) with zero padding.

    Sequences are (T_i, F) arrays; batches never mix buckets, so each jit
    sees at most ``len(ladder)`` input shapes.
    """
    lengths = np.asarray([len(s) for s in sequences])
    if ladder is None:
        ladder = make_bucket_ladder(lengths, n_buckets)
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(sequences)) if shuffle else np.arange(len(sequences))

    groups: dict[int, list[int]] = defaultdict(list)
    for i in order:
        groups[bucket_for(lengths[i], ladder)].append(i)

    feat_dim = sequences[0].shape[-1]
    for bucket_len in sorted(groups):
        idx = groups[bucket_len]
        for lo in range(0, len(idx), batch_size):
            sel = idx[lo : lo + batch_size]
            if len(sel) < batch_size:
                if drop_last:
                    continue
                # pad the batch with repeats; their mask rows stay real but
                # callers weight by the true count like train.loop does
                sel = sel + idx[: batch_size - len(sel)]
            x = np.zeros((len(sel), bucket_len, feat_dim), dtype=np.float32)
            ls = np.empty(len(sel), dtype=np.int32)
            for j, i in enumerate(sel):
                seq = sequences[i][:bucket_len]
                x[j, : len(seq)] = seq
                ls[j] = len(seq)
            yield x, ls, labels[list(sel)]
