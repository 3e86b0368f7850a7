"""CNN-BiLSTM hybrid with attention — the flagship (north-star) model.

TPU-native re-implementation of ``AudioDeepfakeDetector``
(reference/cnn_bilstm_hybrid.py:20-68), preserving its exact semantics,
including two deliberate reference quirks that are part of the numeric
contract:

1. The Conv1d treats the 63 *time frames* as input channels and the 19
   cepstral coefficients as the sequence axis (reference permutes
   ``(B, 19, 63) -> (B, 63, 19)`` before a ``Conv1d(in_channels=63, ...)``,
   reference/cnn_bilstm_hybrid.py:26, 57). In channel-last JAX the input
   ``(B, 19, 63)`` is already in conv layout — no transpose needed.
2. ``LayerNorm(1)`` applied to the softmax attention weights
   (reference/cnn_bilstm_hybrid.py:44, 63) normalizes over a singleton axis,
   which collapses every weight to the LayerNorm *bias* — the attention is
   effectively a learned scalar gate. Preserved by default;
   ``fixed_attention=True`` gives the evidently-intended softmax attention.

Layout convention: inputs are ``(B, 19, 63)`` CQCC exactly as the reference's
``CQCCDataset`` serves them (reference/cnn_bilstm_hybrid.py:13).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from audioanalysisdetector_tpu.models.lstm import BiLSTM


class CNNBiLSTMHybrid(nn.Module):
    feature_dim: int = 19
    lstm_units: int = 32
    dense_units: int = 64
    dropout_rate: float = 0.5
    conv_dropout: float = 0.3
    fixed_attention: bool = False
    logits: bool = False  # True: return pre-sigmoid logits (stable BCE)
    bn_axis_name: str | None = None  # set to the mesh axis for sync-BN under shard_map

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        # x: (B, 19, 63) — sequence axis 19 (cepstra), channels 63 (frames)
        h = nn.Conv(features=64, kernel_size=(3,), padding=((1, 1),), name="conv")(x)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn",
            axis_name=self.bn_axis_name,
        )(h)
        h = nn.relu(h)
        h = nn.max_pool(h, window_shape=(2,), strides=(2,))  # (B, 9, 64)
        h = nn.Dropout(self.conv_dropout, deterministic=not train)(h)

        lstm_out = BiLSTM(self.lstm_units, name="bilstm")(h)  # (B, 9, 64)

        attn_logits = nn.Dense(1, name="attention")(lstm_out)  # (B, 9, 1)
        attn = nn.softmax(attn_logits, axis=1)
        if not self.fixed_attention:
            # LayerNorm over the singleton axis — the reference quirk
            attn = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(attn)
        weighted = lstm_out * attn
        pooled = jnp.max(weighted, axis=1)  # global max over time -> (B, 64)

        h = nn.Dense(self.dense_units, name="fc1")(pooled)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        out = nn.Dense(1, name="fc2")(h)  # (B, 1)
        if self.logits:
            return out
        return nn.sigmoid(out)
