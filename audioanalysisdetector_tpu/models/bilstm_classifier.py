"""Stacked BiLSTM classifier — the GMM⊕BiLSTM fusion system's neural half.

TPU-native counterpart of ``BiLSTMClassifier``
(reference/ASV_dl_func.py:1427-1445): two stacked bidirectional LSTMs
(hidden 128), dropout 0.3 between/after, last-timestep readout, linear head
to 2 logits. Input is time-major CQCC ``(B, T, F)`` (F=19 after
``transpose_cqcc``).

The reference reads ``out[:, -1, :]`` — the *final padded* timestep — which
is exact for the fixed-length 2-s chunks the system trains on (T=63
everywhere). For ragged batches a ``lengths`` argument selects each
sequence's true last step instead (the reference never needs this because its
pad-collate keeps semantics only through the scorer's mask,
reference/ASV_dl_func.py:1486-1489).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from audioanalysisdetector_tpu.models.lstm import BiLSTM


class BiLSTMClassifier(nn.Module):
    hidden: int = 128
    num_classes: int = 2
    dropout: float = 0.3

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        *,
        train: bool = False,
        lengths: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        h = BiLSTM(self.hidden, name="bilstm1")(x, lengths)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        if lengths is None:
            # fixed-length readout uses only position T-1: the second BiLSTM
            # computes just that position (fwd carry-only scan + one bwd cell
            # step) instead of materializing its (B, T, 2H) output
            last = BiLSTM(self.hidden, name="bilstm2")(h, last_only=True)
        else:
            h = BiLSTM(self.hidden, name="bilstm2")(h, lengths)
            idx = jnp.clip(lengths - 1, 0, h.shape[1] - 1)
            last = jnp.take_along_axis(h, idx[:, None, None], axis=1)[:, 0, :]
        last = nn.Dropout(self.dropout, deterministic=not train)(last)
        return nn.Dense(self.num_classes, name="fc")(last)
