"""Pallas TPU kernel: fused windowed-DFT -> power -> mel projection.

The mel frontend's hot path is ``mel = ((frames @ C)^2 + (frames @ S)^2) @ M^T``
(see frontend/stft.py). Under plain XLA the two ``(N, 1025)`` spectrum
intermediates round-trip through HBM (~4 GB of traffic for a 4096-utterance
batch). This kernel tiles the frequency axis and keeps every intermediate in
VMEM: each (frame-tile, freq-tile) grid step computes a partial power
spectrum on the MXU and immediately contracts it into the mel accumulator —
the full spectrum never exists in memory.

Grid: ``(n_frame_tiles, n_freq_tiles)`` with the freq axis innermost so the
output block accumulates across minor steps. Frame tiles are fetched once
per row of the grid (their index_map ignores the freq index, so the
pipeline reuses the resident block).

Accumulation is float32; inputs may be bfloat16 for MXU throughput
(``preferred_element_type`` pins the accumulator precision).

Measured (v5e, 258k frames = one 4096-utterance batch): 45 ms at
tile (512, 128) — bit-exact vs the XLA path — against ~25 ms for XLA's own
scheduling of the same GEMM chain; larger tiles exceed VMEM with the
(tile_n x n_fft) frames block resident. XLA remains the default frontend
path; this kernel is the maintained fusion alternative (a reduction-split
design that shrinks the frames block is the known next step).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audioanalysisdetector_tpu.frontend.db import power_to_db
from audioanalysisdetector_tpu.frontend.mel import MelConfig
from audioanalysisdetector_tpu.frontend.stft import _rdft_bases, frame_signal

TILE_N = 512  # frames per tile — large to amortize DFT-basis streaming
TILE_K = 128  # frequency bins per tile


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@lru_cache(maxsize=None)
def _padded_operands(cfg: MelConfig, k_pad: int):
    """Host-side numpy constants: windowed DFT bases + mel weights, freq-padded.

    Returns NUMPY arrays — converting to jnp here would cache tracers when
    first called under jit.
    """
    cos_b, sin_b = _rdft_bases(cfg.n_fft, cfg.window, cfg.win_length or cfg.n_fft)
    melT = cfg.filterbank().T.astype(np.float32)  # (n_freq, n_mels)
    n_freq = cos_b.shape[1]
    cos_p = np.zeros((cfg.n_fft, k_pad), np.float32)
    sin_p = np.zeros((cfg.n_fft, k_pad), np.float32)
    mel_p = np.zeros((k_pad, melT.shape[1]), np.float32)
    cos_p[:, :n_freq] = cos_b
    sin_p[:, :n_freq] = sin_b
    mel_p[:n_freq] = melT
    return cos_p, sin_p, mel_p


def _kernel(frames_ref, cos_ref, sin_ref, mel_ref, out_ref):
    k = pl.program_id(1)
    re = jnp.dot(frames_ref[:], cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames_ref[:], sin_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im  # (TILE_N, TILE_K) f32, lives in VMEM only
    contrib = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)

    @pl.when(k == 0)
    def _():
        out_ref[:] = contrib

    @pl.when(k > 0)
    def _():
        out_ref[:] = out_ref[:] + contrib


def fused_mel_from_frames(
    frames: jnp.ndarray,
    cfg: MelConfig = MelConfig(),
    *,
    compute_dtype: str = "float32",
    interpret: bool = False,
    tile_n: int = TILE_N,
    tile_k: int = TILE_K,
) -> jnp.ndarray:
    """(N, n_fft) windowed-unapplied frames -> (N, n_mels) mel energies.

    The window is folded into the DFT bases, so raw frames go straight in.
    """
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    k_pad = _round_up(cfg.n_fft // 2 + 1, tile_k)
    cos_np, sin_np, mel_np = _padded_operands(cfg, k_pad)
    cos_b = jnp.asarray(cos_np, dtype)
    sin_b = jnp.asarray(sin_np, dtype)
    mel_p = jnp.asarray(mel_np, jnp.float32)
    n, n_fft = frames.shape
    n_pad = _round_up(max(n, tile_n), tile_n)
    if n_pad != n:
        frames = jnp.pad(frames, ((0, n_pad - n), (0, 0)))
    frames = frames.astype(dtype)
    n_mels = mel_p.shape[1]
    grid = (n_pad // tile_n, k_pad // tile_k)

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, n_fft), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, tile_k), lambda i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, tile_k), lambda i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, n_mels), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, n_mels), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_mels), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * n_fft * k_pad * 2 + 2 * n_pad * k_pad * n_mels,
            bytes_accessed=n_pad * n_fft * 4 + 2 * n_fft * k_pad * 4 + n_pad * n_mels * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(frames, cos_b, sin_b, mel_p)
    return out[:n]


def fused_log_mel_spectrogram(
    y: jnp.ndarray,
    cfg: MelConfig = MelConfig(),
    *,
    ref: float | str = "max",
    top_db: float | None = 80.0,
    compute_dtype: str = "float32",
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in fused replacement for ``frontend.log_mel_spectrogram``:
    ``(..., n) -> (..., n_mels, T)`` with per-utterance dB reference."""
    frames = frame_signal(
        y, n_fft=cfg.n_fft, hop_length=cfg.hop_length, center=cfg.center,
        pad_mode=cfg.pad_mode,
    )  # (..., T, n_fft)
    lead = frames.shape[:-2]
    T = frames.shape[-2]
    flat = frames.reshape(-1, cfg.n_fft)
    mel = fused_mel_from_frames(flat, cfg, compute_dtype=compute_dtype, interpret=interpret)
    mel = mel.reshape(lead + (T, cfg.n_mels))
    mel = jnp.swapaxes(mel, -1, -2)  # (..., n_mels, T)
    return power_to_db(mel, ref=ref, top_db=top_db, utt_axes=2)
