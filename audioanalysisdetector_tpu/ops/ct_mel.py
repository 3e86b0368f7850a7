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
promises. End-to-end, ``ct_log_mel`` originally LOST (46.5 vs 43.5 ms)
because XLA materialized the reflect-padded signal (a ~1 GB copy) before
the kernel could stream it; round 4's boundary-frame split (kernel on the
raw body, XLA GEMM path on the small reflect snippets — see ``ct_log_mel``)
removed that copy and the e2e now measures **42.7-42.9 ms vs XLA's
43.2 ms** (kernel body alone 39.5 ms; the remaining ~3 ms is the
boundary stitch + ``power_to_db``). A ~1% e2e win. The distance from the
traffic-math promise is the Mosaic toolchain itself, quantified as:

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

LEDGER CLOSED (round 5, final): the XLA mel path IS the production
contract and this kernel is **closed — platform-bound**. The ~1% e2e win
is within run-to-run noise of the tunnel-timed measurement, the XLA path
is the bit-stable contract (the kernel's reassociated f32 accumulation
differs by up to ~0.06 dB after ``power_to_db(ref=max)``), and the
remaining gap to the traffic-math promise is the Mosaic grid-streaming
ceiling (~126 vs ~575 GB/s), not anything addressable in this kernel.
No further optimization rounds are planned; the kernel stays maintained
and parity-tested as the measured proof that at parity-scale shapes the
Mosaic streaming pipeline, not the factorization, is the binding
constraint. Mosaic legality rules honored (probed): dot_general
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
    if n_pad_len % N1:
        extra = N1 - n_pad_len % N1
        wav_padded = jnp.pad(wav_padded, ((0, 0), (0, extra)))
        n_pad_len += extra
    wav3 = wav_padded.reshape(B, n_pad_len // N1, N1)  # host/XLA-side chunking
    return _ct_mel_parts([wav3], cfg, n_frames=n_frames, interpret=interpret)


def _ct_mel_parts(
    parts: list[jnp.ndarray],
    cfg: MelConfig,
    *,
    n_frames: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Core kernel over a padded signal supplied as chunked (B, nc_i, 64)
    SEGMENTS, concatenated along the chunk axis INSIDE the grid.

    The segmented form exists so ``ct_log_mel`` can pass [head, body, tail]
    where body is a zero-copy reshape VIEW of the raw waveform and head/tail
    are the small reflect regions (16 chunks each at n_fft=2048): the
    earlier single-tensor form forced XLA to materialize the whole padded
    signal (a ~1 GB copy at the benchmark batch) before the kernel could
    stream it — measured as the entire e2e deficit vs the XLA path.
    """
    B = parts[0].shape[0]
    n_fft, hop = cfg.n_fft, cfg.hop_length
    if B % UTT_TILE:
        raise ValueError(f"batch {B} must be a multiple of {UTT_TILE}")
    if hop % N1 or n_fft % hop:
        raise ValueError(f"need hop % {N1} == 0 and n_fft % hop == 0")
    n_chunks_each = [int(p.shape[1]) for p in parts]
    n_pad_len = N1 * sum(n_chunks_each)
    # coverage is checked against the ROUNDED-UP length (the docstring's
    # contract) — checking before the pad rejected inputs whose tail frame
    # fits only after the 64-multiple zeros
    if (n_frames - 1) * hop + n_fft > n_pad_len:
        raise ValueError("padded signal too short for n_frames")
    ops = [jnp.asarray(o) for o in _ct_operands(cfg)]
    n_mels = ops[-1].shape[-1]
    rows = UTT_TILE * n_frames
    hop_c = hop // N1
    qc = n_fft // hop  # chunk groups per frame
    n_parts = len(parts)

    # cumulative chunk offsets of each segment along the virtual concat axis
    _offs = np.cumsum([0] + n_chunks_each)
    bounds = list(zip(_offs[:-1].tolist(), _offs[1:].tolist()))

    def kernel(*refs):
        part_refs = refs[:n_parts]
        csA_ref, wc_ref, tr_ref, ti_ref, w_ref, m6_ref, out_ref = refs[n_parts:]
        # loop-free framing: frame f's 32 chunks are global chunks
        # 8f .. 8f+31 = q-th shifted stride-8 view, q = 0..3; plus the
        # stage-A K-pad as a zeros part folded into the same concat.
        # Each q-slice is assembled from the SEGMENT refs directly (static
        # sub-slices of the virtual [head|body|tail] concat) — materializing
        # the concatenated signal first costs an extra full-tile VMEM copy
        # per grid step, measured at ~4 ms over the batch.
        fparts = []
        for q in range(qc):
            s = hop_c * q
            e = s + n_frames * hop_c
            segs = [
                r[:, max(s, lo) - lo : min(e, hi) - lo, :]
                for r, (lo, hi) in zip(part_refs, bounds)
                if max(s, lo) < min(e, hi)
            ]
            p = segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=1)
            p = p.reshape(UTT_TILE, n_frames, hop_c, N1).reshape(rows, hop_c, N1)
            fparts.append(p)
        fparts.append(jnp.zeros((rows, KPAD - N2, N1), jnp.float32))
        wpad = jnp.concatenate(
            [w_ref[:], jnp.zeros((KPAD - N2, N1), jnp.float32)], axis=0
        )
        f3p = jnp.concatenate(fparts, axis=1) * wpad  # (rows, 128_n2pad, 64_n1)
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
                (UTT_TILE, nc, N1), lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for nc in n_chunks_each
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
    )(*parts, *ops)
    return out


def ct_log_mel(
    wav: jnp.ndarray,
    cfg: MelConfig = MelConfig(),
    *,
    ref="max",
    top_db: float | None = 80.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in (B, n) -> (B, n_mels, T) log-mel via the CT-fused kernel.

    Padding strategy (round-4 measurements, batch 8192 x 2 s, v5e):

    - Materializing the reflect-padded signal in XLA before the kernel
      costs a full-signal copy (~1 GB here) — the entire e2e deficit of
      earlier rounds (46.5 ms vs XLA 43.8).
    - Streaming [head | body | tail] reflect segments and concatenating
      inside the grid (``_ct_mel_parts``) removes the copy but the 3-stream
      grid pipeline gives back ~4 ms (42.9 ms kernel-only vs 39.2 single
      stream) — a tie with XLA.
    - The shipped fast path exploits that only the first/last
      ``ceil(pad/hop)`` frames touch the padding at all: the kernel runs on
      the RAW waveform body (single stream, zero-copy reshape view) for the
      interior frames, and the few boundary frames come from the XLA GEMM
      path on ~2.5k-sample reflect snippets, stitched along the frame axis.
      Measured e2e: 42.7-42.9 ms vs the XLA path's 43.2 ms (same-session
      pairs; kernel body alone 39.5 ms, boundary stitch + dB ~3 ms).

    Falls back to the XLA-side full pad for shapes/modes the fast path
    cannot express (pad not aligned to the chunk/hop grid, non-reflect).
    """
    from audioanalysisdetector_tpu.frontend.stft import power_spectrogram

    b_extra = -wav.shape[0] % UTT_TILE  # kernel grid needs full 8-utt tiles
    if b_extra:
        out = ct_log_mel(
            jnp.pad(wav, ((0, b_extra), (0, 0))), cfg,
            ref=ref, top_db=top_db, interpret=interpret,
        )
        return out[: wav.shape[0]]  # per-utterance dB: pad rows are inert

    n = wav.shape[-1]
    hop, n_fft = cfg.hop_length, cfg.n_fft
    n_frames = 1 + n // hop
    pad = n_fft // 2
    fast = (
        cfg.center
        and cfg.pad_mode == "reflect"
        and n % N1 == 0
        and n > pad
        and hop % N1 == 0
        and n_fft % hop == 0
    )
    if fast:
        f_lo = -(-pad // hop)  # first frame whose window needs no left pad
        f_hi = (n + pad - n_fft) // hop  # last frame fully inside the body
        off = f_lo * hop - pad
        fast = f_hi >= f_lo and off >= 0 and off % N1 == 0
    if fast:
        B = wav.shape[0]
        body = wav.reshape(B, n // N1, N1)
        if off:
            body = body[:, off // N1 :, :]
        mel_int = _ct_mel_parts(
            [body], cfg, n_frames=f_hi - f_lo + 1, interpret=interpret
        )  # (B, nf_int, n_mels)

        # boundary frames (f_lo at the left, n_frames-1-f_hi at the right)
        # via the XLA GEMM path on small manually-reflect-padded snippets
        head = wav[:, 1 : pad + 1][:, ::-1]
        left = jnp.concatenate(
            [head, wav[:, : (f_lo - 1) * hop + n_fft - pad]], axis=-1
        )
        fb = jnp.asarray(cfg.filterbank(), wav.dtype)

        def bmel(snippet):
            # method is pinned to the matmul-DFT: it matches the kernel's
            # numerics, and the drop-in path must never depend on FFT
            # (UNIMPLEMENTED on the axon TPU runtime).
            S = power_spectrogram(
                snippet, n_fft=n_fft, hop_length=hop, win_length=cfg.win_length,
                window=cfg.window, center=False, power=cfg.power,
                method="matmul",
            )
            return jnp.einsum("mf,bft->btm", fb, S)

        parts = [bmel(left), mel_int]
        n_right = n_frames - 1 - f_hi  # frames whose window needs right pad
        if n_right:  # zero when hop divides n with n % hop >= pad
            need_tail = (n_frames - 1) * hop + n_fft - pad - n  # in [1, pad]
            tail = wav[:, n - 1 - pad : n - 1][:, ::-1][:, :need_tail]
            right = jnp.concatenate(
                [wav[:, (f_hi + 1) * hop - pad :], tail], axis=-1
            )
            parts.append(bmel(right))
        mel = jnp.concatenate(parts, axis=1)
    else:
        wav_p = jnp.pad(wav, ((0, 0), (pad, pad)), mode=cfg.pad_mode)
        mel = ct_mel(wav_p, cfg, n_frames=n_frames, interpret=interpret)
    mel = jnp.swapaxes(mel, -1, -2)
    return power_to_db(mel, ref=ref, top_db=top_db, utt_axes=2)
