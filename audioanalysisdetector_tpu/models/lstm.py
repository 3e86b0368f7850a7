"""Bidirectional LSTM layers via ``jax.lax.scan`` (torch-compatible numerics).

The reference's recurrent models run on ``torch.nn.LSTM``
(reference/ASV_dl_func.py:1430-1434, reference/cnn_bilstm_hybrid.py:34-40).
This module provides the TPU-native counterpart: a scan over time of a fused
LSTM cell whose parameterization maps 1:1 onto torch's
(``weight_ih (4H, I)`` / ``weight_hh (4H, H)`` / two biases, gate order
``[i, f, g, o]``), so checkpoint-level parity tests are exact.

TPU notes: the input projection ``x @ W_ih^T`` is computed INSIDE the scan
cell, not hoisted into one time-parallel GEMM. Hoisting is the standard GPU
idiom, but it materializes the ``(B, T, 4H)`` gate pre-activation tensor in
HBM and the scan then re-reads it step by step — 2 x 4H floats of traffic
per input element, vs I floats (I = 19..256 here, 4H = 512) to stream ``x``
directly. Measured on the target runtime at batch 4096 (2-layer BiLSTM
stack, T=63, H=128): hoisted 11.1 ms, in-cell 6.4 ms, bit-identical
outputs. ``lax.scan`` unroll > 1 was measured slower (7.0-7.7 ms), and a
merged both-directions-in-one-scan variant was slower too (7.1 ms) — XLA
already overlaps the two independent direction scans. The backward
direction uses ``lax.scan(reverse=True)`` instead of flip-scan-flip,
removing four full-sequence flip copies per stack (6.2 -> 5.4 ms,
bit-identical).
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
        self,
        x: jnp.ndarray,
        lengths: jnp.ndarray | None = None,
        *,
        last_only: bool = False,
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

        # full-length reversal is done by the scan itself (reverse=True) —
        # no flip copies; ragged rows still need the length-aware gather
        ragged_reverse = self.reverse and lengths is not None
        if ragged_reverse:
            x = _reverse_padded(x, lengths)

        bias = b_ih + b_hh

        # input projection inside the cell: streams x (I floats/elem) instead
        # of a hoisted (B, T, 4H) pre-activation tensor (see module docstring;
        # 1.7x on the target runtime at batch 4096, bit-identical)
        def cell(carry, x_t):
            h, c = carry
            gates = x_t @ w_ih + bias + h @ w_hh
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

        if last_only and lengths is not None:
            raise ValueError(
                "last_only only supports fixed-length batches; ragged rows "
                "need the full sequence + a length-indexed gather"
            )
        if last_only:
            # position T-1 of the output only (the classifiers' readout).
            # Backward direction: its value at T-1 IS its first step from the
            # zero state (h0 @ W_hh == 0, dropped), one cell evaluation.
            # Forward direction: carry-only scan — the (B, T, H) output
            # sequence is never materialized.
            if self.reverse:
                (h_last, _), _ = cell((h0, h0), x[:, -1])
                return h_last
            def carry_cell(carry, x_t):
                return cell(carry, x_t)[0], None
            (h_last, _), _ = jax.lax.scan(carry_cell, (h0, h0), jnp.swapaxes(x, 0, 1))
            return h_last

        (_, _), hs = jax.lax.scan(
            cell,
            (h0, h0),
            jnp.swapaxes(x, 0, 1),
            reverse=self.reverse and not ragged_reverse,
        )
        out = jnp.swapaxes(hs, 0, 1)  # (B, T, H)
        if ragged_reverse:
            out = _reverse_padded(out, lengths)
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
        self,
        x: jnp.ndarray,
        lengths: jnp.ndarray | None = None,
        *,
        last_only: bool = False,
    ) -> jnp.ndarray:
        """Full output ``(B, T, 2H)``; with ``last_only`` (fixed-length
        batches only) just position T-1, ``(B, 2H)``, computed without
        materializing either direction's sequence."""
        if last_only and lengths is not None:
            raise ValueError(
                "last_only only supports fixed-length batches; ragged rows "
                "need the full sequence + a length-indexed gather"
            )
        fwd = LSTMLayer(self.hidden, reverse=False, name="fwd")(
            x, last_only=last_only
        )
        bwd = LSTMLayer(self.hidden, reverse=True, name="bwd")(
            x, lengths, last_only=last_only
        )
        return jnp.concatenate([fwd, bwd], axis=-1)
