"""Pallas TPU kernel: Cooley-Tukey-factorized fused wave -> mel energies.

The mel frontend (reference ``extract_mel_spectrogram``,
reference/ASV_dl_func.py:522-538; our GEMM realization in frontend/stft.py)
is traffic-bound under XLA: at batch 8192 x 2 s the materialized
``(B*63, 2048)`` frame matrix and the ``(B*63, 2050)`` spectrum round-trip
~17 GB of HBM — 43.3 ms, 97% of the headline scoring path. Two earlier
fusion attempts lost outright (``ops/fused_logmel.py``, ``ops/wave_mel.py``):
with a direct DFT the windowed bases are 16.8 MB, cannot stay VMEM-resident,
and re-streaming them costs more than the materialization they avoid.

This kernel flips that reuse math by FACTORIZING the DFT (Cooley-Tukey,
2048 = 64 x 32). With ``n = n1 + 64 n2`` (n1 the in-chunk offset) and
``k = k2 + 32 k1``:

    G[k2, n1] = sum_n2 E32[n2, k2] f[n1 + 64 n2]          (stage A)
    X[k2, k1] = sum_n1 G[k2, n1] t[n1, k2] E64[n1, k1]    (twiddle + stage C)

so the resident operands total ~0.7 MB (vs 16.8 MB direct) and the whole
DFT -> |.|^2 -> mel chain runs on-chip per utterance tile: HBM sees the
waveform once in and the (B, 63, n_mels) mel energies once out.

OUTCOME (measured, batch 8192 x 2 s, v5e): the kernel core is the first
of the three mel-fusion attempts to beat XLA — **39.2 ms vs 43.3 ms on
pre-padded input** — but only by ~10%, far from the ~5x the traffic math
promises, and the end-to-end ``ct_log_mel`` (which still pays the XLA-side
reflect pad, a full-signal copy) measures 46.5 ms vs 43.5 ms. The gap is
the Mosaic toolchain itself, quantified as:

- input streaming through the pallas grid pipeline runs at ~126 GB/s on
  this chip/toolchain (measured with a trivial slice kernel over the same
  blocks; the identical read inside plain XLA runs at ~575 GB/s) — a
  ~10 ms floor for the 1.1 GB input before any compute;
- small-K GEMMs are catastrophic on the MXU: the K=32 stage-A contraction
  measured 14.5 ms alone; zero-padding K to 128 (4x redundant FLOPs)
  makes it ~7x faster — K-padding is applied below;
- lane-dim relayouts (slices of a 128-lane tensor into 64-lane halves)
  cost ~9 ms; eliminated by squaring the packed ``[xr|xi]`` tensor and
  folding the half-sum into a duplicated mel matrix (sum M (xr^2 + xi^2)
  == sum [M|M] x^2);
- the two unavoidable minor-axis transposes between stages cost ~4 ms
  each regardless of volume.

The XLA mel path therefore stays the production default (bit-stable
contract; the kernel's reassociated f32 accumulation differs by up to
~0.06 dB after ``power_to_db(ref=max)``); this kernel is the maintained
proof that beating XLA here requires a faster streaming pipeline, not a
better factorization. Mosaic legality rules honored (probed): dot_general
only as 3D x 2D contracting the MINOR dim or batch-dim0 3D x 3D; reshapes
only split/merge non-minor dims; no lane-splitting shape casts (the
waveform is pre-chunked host-side to ``(B, n_pad/64, 64)`` and frames
assemble from 4 shifted sublane views + one concat, loop-free).
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
from audioanalysisdetector_tpu.frontend.stft import _window_array

UTT_TILE = 8  # utterances per grid step (measured fastest of 2/4/8/16)

N1 = 64   # in-chunk offset / stage-C DFT length (the lane dimension)
N2 = 32   # chunk index / stage-A DFT length
KPAD = 128  # stage-A contraction zero-padded to a full MXU K tile


@lru_cache(maxsize=None)
def _ct_operands(cfg: MelConfig):
    """Host-side numpy constants (jnp conversion at call time, not cached)."""
    n_fft = cfg.n_fft
    if n_fft != N1 * N2:
        raise ValueError(f"ct_mel supports n_fft == {N1 * N2} only, got {n_fft}")
    a2 = 2 * np.pi * np.outer(np.arange(N2), np.arange(N2)) / N2
    c32, s32 = np.cos(a2), -np.sin(a2)  # E32 (symmetric)
    a1 = 2 * np.pi * np.outer(np.arange(N1), np.arange(N1)) / N1
    c64, s64 = np.cos(a1), -np.sin(a1)  # E64 (symmetric)
    at = 2 * np.pi * np.outer(np.arange(N1), np.arange(N2)) / n_fft
    tr, ti = np.cos(at), -np.sin(at)  # twiddle t[n1, k2]
    win = _window_array(cfg.window, cfg.win_length or n_fft, n_fft)
    w_rs = win.reshape(N2, N1)  # w[n1 + 64 n2]

    # stage A operand, K zero-padded to 128, N = [gr k2 | gi k2]
    csA = np.zeros((KPAD, 2 * N2))
    csA[:N2, :N2] = c32
    csA[:N2, N2:] = s32
    # stage C merged complex operand: [br|bi] (.,128) @ Wc -> [xr|xi]
    wc = np.block([[c64, s64], [-s64, c64]])  # (128, 128)

    # mel weights live on rfft bins 0..1024 only (librosa counts each
    # conjugate-symmetric pair ONCE); the CT grid produces all 2048 bins, so
    # the spectral weight is split evenly across each symmetric pair
    # (w/2 at k and w/2 at 2048-k; |X[k]| == |X[2048-k]| for real input —
    # assigning full weight to both sides double-counts bins 1..1023).
    # Laid out per bin k = k2 + 32*k1 as M3[k2, k1, b], then DUPLICATED over
    # the [xr|xi] halves so the power contraction consumes the packed
    # squares without lane slicing.
    mel = cfg.filterbank().astype(np.float64)  # (n_mels, 1025)
    m2048 = np.zeros((n_fft, mel.shape[0]))
    m2048[: n_fft // 2 + 1] = mel.T
    m2048[1 : n_fft // 2] *= 0.5
    m2048[n_fft // 2 + 1 :] = m2048[1 : n_fft // 2][::-1]
    k2 = np.arange(N2)[:, None]
    k1 = np.arange(N1)[None, :]
    m3 = m2048[k2 + N2 * k1]  # (32, 64, n_mels)
    m6 = np.concatenate([m3, m3], axis=1)  # (32, 128, n_mels)

    f32 = lambda a: np.ascontiguousarray(a, dtype=np.float32)
    return f32(csA), f32(wc), f32(tr), f32(ti), f32(w_rs), f32(m6)


def ct_mel(
    wav_padded: jnp.ndarray,
    cfg: MelConfig = MelConfig(),
    *,
    n_frames: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, n_padded) center-padded waveforms -> (B, n_frames, n_mels) mel power.

    ``wav_padded`` carries the center padding (n_fft//2 per side). Constraints:
    B % UTT_TILE == 0, hop % 64 == 0, n_fft % hop == 0, and frame coverage
    (n_frames-1)*hop + n_fft <= n_padded (rounded up to a 64 multiple).
    """
    B, n_pad_len = wav_padded.shape
    n_fft, hop = cfg.n_fft, cfg.hop_length
    if B % UTT_TILE:
        raise ValueError(f"batch {B} must be a multiple of {UTT_TILE}")
    if hop % N1 or n_fft % hop:
        raise ValueError(f"need hop % {N1} == 0 and n_fft % hop == 0")
    if n_pad_len % N1:
        extra = N1 - n_pad_len % N1
        wav_padded = jnp.pad(wav_padded, ((0, 0), (0, extra)))
        n_pad_len += extra
    # coverage is checked against the ROUNDED-UP length (the docstring's
    # contract) — checking before the pad rejected inputs whose tail frame
    # fits only after the 64-multiple zeros
    if (n_frames - 1) * hop + n_fft > n_pad_len:
        raise ValueError("padded signal too short for n_frames")
    n_chunks = n_pad_len // N1
    wav3 = wav_padded.reshape(B, n_chunks, N1)  # host/XLA-side chunking
    ops = [jnp.asarray(o) for o in _ct_operands(cfg)]
    n_mels = ops[-1].shape[-1]
    rows = UTT_TILE * n_frames
    hop_c = hop // N1
    qc = n_fft // hop  # chunk groups per frame

    def kernel(wav_ref, csA_ref, wc_ref, tr_ref, ti_ref, w_ref, m6_ref, out_ref):
        w3 = wav_ref[:]
        # loop-free framing: frame f's 32 chunks are global chunks
        # 8f .. 8f+31 = q-th shifted stride-8 view, q = 0..3; plus the
        # stage-A K-pad as a zeros part folded into the same concat
        parts = []
        for q in range(qc):
            p = w3[:, hop_c * q : hop_c * q + n_frames * hop_c, :]
            p = p.reshape(UTT_TILE, n_frames, hop_c, N1).reshape(rows, hop_c, N1)
            parts.append(p)
        parts.append(jnp.zeros((rows, KPAD - N2, N1), jnp.float32))
        wpad = jnp.concatenate(
            [w_ref[:], jnp.zeros((KPAD - N2, N1), jnp.float32)], axis=0
        )
        f3p = jnp.concatenate(parts, axis=1) * wpad  # (rows, 128_n2pad, 64_n1)
        f3t = jnp.swapaxes(f3p, 1, 2)  # (rows, 64_n1, 128)
        dgm = lambda a, e: jax.lax.dot_general(
            a, e, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        g = dgm(f3t, csA_ref[:])  # (rows, 64_n1, 64=[gr|gi])
        gr = g[..., :N2]
        gi = g[..., N2:]
        br = gr * tr_ref[:] - gi * ti_ref[:]
        bi = gr * ti_ref[:] + gi * tr_ref[:]
        bm = jnp.concatenate([br, bi], axis=1)  # (rows, 128_[n1;n1], 32_k2)
        bmt = jnp.swapaxes(bm, 1, 2)  # (rows, 32_k2, 128)
        x = dgm(bmt, wc_ref[:])  # (rows, 32_k2, 128=[xr|xi])
        sq = x * x
        # mel: batch k2, contract the packed 128 squares against [M3|M3]
        contrib = jax.lax.dot_general(
            jnp.swapaxes(sq, 0, 1),
            m6_ref[:],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (32, rows, n_mels)
        out_ref[:] = jnp.sum(contrib, axis=0).reshape(
            UTT_TILE, n_frames, out_ref.shape[-1]
        )

    out = pl.pallas_call(
        kernel,
        grid=(B // UTT_TILE,),
        in_specs=[
            pl.BlockSpec(
                (UTT_TILE, n_chunks, N1), lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [
            pl.BlockSpec(
                o.shape,
                (lambda b, nd=o.ndim: (0,) * nd),
                memory_space=pltpu.VMEM,
            )
            for o in ops
        ],
        out_specs=pl.BlockSpec(
            (UTT_TILE, n_frames, n_mels), lambda b: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_frames, n_mels), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(wav3, *ops)
    return out


def ct_log_mel(
    wav: jnp.ndarray,
    cfg: MelConfig = MelConfig(),
    *,
    ref="max",
    top_db: float | None = 80.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in (B, n) -> (B, n_mels, T) log-mel via the CT-fused kernel."""
    n_frames = 1 + wav.shape[-1] // cfg.hop_length
    pad = cfg.n_fft // 2
    wav_p = jnp.pad(wav, ((0, 0), (pad, pad)), mode=cfg.pad_mode)
    mel = ct_mel(wav_p, cfg, n_frames=n_frames, interpret=interpret)
    mel = jnp.swapaxes(mel, -1, -2)
    return power_to_db(mel, ref=ref, top_db=top_db, utt_axes=2)
