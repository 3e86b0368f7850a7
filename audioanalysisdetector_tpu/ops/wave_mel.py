"""Experimental Pallas kernel: mel energies straight from raw waveforms.

Motivation (measured on v5e, batch 4096 of 2-s clips): the XLA mel path
costs ~26.5 ms, of which ~17 ms is the DFT GEMM at peak and ~10 ms is the
frame gather — hop 512 with n_fft 2048 re-materializes every sample 4x
(2.1 GB written + read per batch). This kernel never materializes frames in
HBM: each grid step DMAs a tile of utterances' RAW samples into VMEM,
builds the (frames, n_fft) matrix in scratch with on-chip copies, and runs
the DFT + power + mel GEMMs from there. The DFT bases stream once per
frequency tile (grid is frequency-outer), not once per frame tile.

Alternatives measured and rejected: strided-conv formulation (51.9 ms —
XLA's conv lowering loses to the GEMM), fused single-GEMM with concatenated
cos|sin bases (54.5 ms — breaks XLA's scheduling), optimization barriers
(no effect).

OUTCOME (measured, batch 4096): bit-exact vs the XLA path but 30.6 ms vs
27.4 ms. Keeping the frame tile resident in VMEM forces the DFT bases
(21 MB) to re-stream once per utterance tile (512 tiles -> ~10.7 GB), which
costs more than the 2.1 GB frame-gather round trip it eliminates; VMEM
caps the frame tile at ~8-12 utterances, too small to amortize the bases.
XLA's materialize-then-GEMM plan is near-optimal for this op on this chip —
the gather buys basis reuse. Kept as a documented experiment (and as the
pattern for ops where the reuse math flips, e.g. much smaller bases).
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
from audioanalysisdetector_tpu.frontend.stft import _rdft_bases

UTT_TILE = 8  # utterances per grid step (8 x 63 = 504 frame rows per GEMM)
K_TILE = 256  # frequency bins per tile


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@lru_cache(maxsize=None)
def _operands(cfg: MelConfig, k_pad: int):
    cos_b, sin_b = _rdft_bases(cfg.n_fft, cfg.window, cfg.win_length or cfg.n_fft)
    melT = cfg.filterbank().T.astype(np.float32)
    n_freq = cos_b.shape[1]
    cos_p = np.zeros((cfg.n_fft, k_pad), np.float32)
    sin_p = np.zeros((cfg.n_fft, k_pad), np.float32)
    mel_p = np.zeros((k_pad, melT.shape[1]), np.float32)
    cos_p[:, :n_freq] = cos_b
    sin_p[:, :n_freq] = sin_b
    mel_p[:n_freq] = melT
    return cos_p, sin_p, mel_p


def wave_mel(
    wav_padded: jnp.ndarray,
    cfg: MelConfig = MelConfig(),
    *,
    n_frames: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, n_padded) center-padded waveforms -> (B, n_frames, n_mels) mel.

    ``wav_padded`` must already carry the center padding (n_fft//2 each side,
    reflect); B must be a multiple of UTT_TILE.
    """
    B, n_pad_len = wav_padded.shape
    n_fft, hop = cfg.n_fft, cfg.hop_length
    if B % UTT_TILE:
        raise ValueError(f"batch {B} must be a multiple of {UTT_TILE}")
    if (n_frames - 1) * hop + n_fft > n_pad_len:
        # Pallas loads are NOT bounds-checked in-kernel: an oversized
        # n_frames would read clamped/garbage tail frames silently
        raise ValueError("padded signal too short for n_frames")
    k_pad = _round_up(n_fft // 2 + 1, K_TILE)
    cos_np, sin_np, mel_np = _operands(cfg, k_pad)
    cos_p = jnp.asarray(cos_np)
    sin_p = jnp.asarray(sin_np)
    mel_p = jnp.asarray(mel_np)
    n_mels = mel_p.shape[1]
    rows = UTT_TILE * n_frames

    def kernel(wav_ref, cos_ref, sin_ref, mel_ref, out_ref, frames_scr):
        k = pl.program_id(1)  # grid is (utt_tile, freq_tile); freq is minor

        # build the (UTT_TILE * n_frames, n_fft) frame matrix in VMEM only
        # on the first frequency tile of each utterance tile; it stays
        # resident in scratch for the remaining k steps
        @pl.when(k == 0)
        def _():
            def fill(i, _):
                u = i // n_frames
                f = i % n_frames
                frames_scr[pl.ds(i, 1), :] = wav_ref[
                    pl.ds(u, 1), pl.ds(f * hop, n_fft)
                ]
                return 0

            jax.lax.fori_loop(0, rows, fill, 0)

        re = jnp.dot(frames_scr[:], cos_ref[:], preferred_element_type=jnp.float32)
        im = jnp.dot(frames_scr[:], sin_ref[:], preferred_element_type=jnp.float32)
        power = re * re + im * im
        contrib = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)

        @pl.when(k == 0)
        def _():
            out_ref[:] = contrib

        @pl.when(k > 0)
        def _():
            out_ref[:] = out_ref[:] + contrib

    # utterances OUTER, frequencies inner: the frames scratch persists
    # across grid steps, so it fills once per utt tile (k==0) and
    # accumulates over k, emitting when k wraps
    grid = (B // UTT_TILE, k_pad // K_TILE)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((UTT_TILE, n_pad_len), lambda b, k: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, K_TILE), lambda b, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, K_TILE), lambda b, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((K_TILE, n_mels), lambda b, k: (k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows, n_mels), lambda b, k: (b, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * n_frames, n_mels), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows, n_fft), jnp.float32)],
        interpret=interpret,
    )(wav_padded, cos_p, sin_p, mel_p)
    return out.reshape(B, n_frames, n_mels)


def wave_log_mel(
    wav: jnp.ndarray,
    cfg: MelConfig = MelConfig(),
    *,
    ref="max",
    top_db: float | None = 80.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in (B, n) -> (B, n_mels, T) using the wave-direct kernel."""
    n_frames = 1 + wav.shape[-1] // cfg.hop_length
    pad = cfg.n_fft // 2
    wav_p = jnp.pad(wav, ((0, 0), (pad, pad)), mode=cfg.pad_mode)
    mel = wave_mel(wav_p, cfg, n_frames=n_frames, interpret=interpret)
    mel = jnp.swapaxes(mel, -1, -2)
    return power_to_db(mel, ref=ref, top_db=top_db, utt_axes=2)
