"""Bidirectional LSTM layers via ``jax.lax.scan`` (torch-compatible numerics).

The reference's recurrent models run on ``torch.nn.LSTM``
(reference/ASV_dl_func.py:1430-1434, reference/cnn_bilstm_hybrid.py:34-40).
This module provides the TPU-native counterpart: a scan over time of a fused
LSTM cell whose parameterization maps 1:1 onto torch's
(``weight_ih (4H, I)`` / ``weight_hh (4H, H)`` / two biases, gate order
``[i, f, g, o]``), so checkpoint-level parity tests are exact.

TPU notes: the input projection ``x @ W_ih^T`` for ALL timesteps is hoisted
out of the scan into one big GEMM (time-parallel); only the ``h @ W_hh^T``
recurrence stays sequential. Sequence lengths here are tiny (T = 9 or 63),
so the recurrence is latency- not bandwidth-limited.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _torch_lstm_uniform(rng, shape, dtype, *, hidden: int):
    bound = 1.0 / jnp.sqrt(hidden)
    return jax.random.uniform(rng, shape, dtype, -bound, bound)


def _reverse_padded(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse each row's first ``lengths[b]`` steps; zero the tail.

    Length-aware reversal for ragged (bucketed) batches: the backward
    direction must consume the TRUE sequence reversed, not the zero padding
    first — otherwise padded and unpadded scores of the same utterance
    diverge (the mask-semantics contract, reference/ASV_dl_func.py:1486-1489).
    """
    t = jnp.arange(x.shape[1])
    idx = lengths[:, None] - 1 - t[None, :]
    valid = idx >= 0
    gathered = jnp.take_along_axis(x, jnp.clip(idx, 0, x.shape[1] - 1)[:, :, None], axis=1)
    return jnp.where(valid[:, :, None], gathered, 0.0)


class LSTMLayer(nn.Module):
    """Unidirectional LSTM over ``(B, T, I) -> (B, T, H)``.

    Zero initial state; parameters laid out exactly like
    ``torch.nn.LSTM``'s per-layer tensors (transposed for row-major GEMM).
    """

    hidden: int
    reverse: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lengths: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        H = self.hidden
        I = x.shape[-1]
        init = lambda rng, shape, dtype=jnp.float32: _torch_lstm_uniform(
            rng, shape, dtype, hidden=H
        )
        w_ih = self.param("w_ih", init, (I, 4 * H))  # torch weight_ih_l0.T
        w_hh = self.param("w_hh", init, (H, 4 * H))  # torch weight_hh_l0.T
        b_ih = self.param("b_ih", init, (4 * H,))
        b_hh = self.param("b_hh", init, (4 * H,))

        if self.reverse:
            x = jnp.flip(x, axis=1) if lengths is None else _reverse_padded(x, lengths)

        # time-parallel input projection: one GEMM for the whole sequence
        gx = x @ w_ih + (b_ih + b_hh)  # (B, T, 4H)

        def cell(carry, gx_t):
            h, c = carry
            gates = gx_t + h @ w_hh
            i_g, f_g, g_g, o_g = jnp.split(gates, 4, axis=-1)
            i_g = jax.nn.sigmoid(i_g)
            f_g = jax.nn.sigmoid(f_g)
            g_g = jnp.tanh(g_g)
            o_g = jax.nn.sigmoid(o_g)
            c = f_g * c + i_g * g_g
            h = o_g * jnp.tanh(c)
            return (h, c), h

        B = x.shape[0]
        h0 = jnp.zeros((B, H), dtype=x.dtype)
        (_, _), hs = jax.lax.scan(cell, (h0, h0), jnp.swapaxes(gx, 0, 1))
        out = jnp.swapaxes(hs, 0, 1)  # (B, T, H)
        if self.reverse:
            out = jnp.flip(out, axis=1) if lengths is None else _reverse_padded(out, lengths)
        return out


class BiLSTM(nn.Module):
    """Bidirectional LSTM: ``(B, T, I) -> (B, T, 2H)`` (fwd ++ bwd).

    ``lengths`` (ragged/bucketed batches) makes the backward direction
    consume each row's true reversed sequence instead of its zero tail;
    without it numerics match ``torch.nn.LSTM(bidirectional=True)`` exactly.
    """

    hidden: int

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lengths: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        fwd = LSTMLayer(self.hidden, reverse=False, name="fwd")(x)
        bwd = LSTMLayer(self.hidden, reverse=True, name="bwd")(x, lengths)
        return jnp.concatenate([fwd, bwd], axis=-1)
