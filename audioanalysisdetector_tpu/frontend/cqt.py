"""Constant-Q transform, TPU-native multi-octave design.

The reference computes CQT through ``librosa.cqt(y, sr, n_bins, bins_per_octave,
fmin=C1)`` (reference/ASV_dl_func.py:458). librosa's implementation is a
recursive resample-and-FFT scheme; the TPU-first re-design here keeps the same
mathematical contract but maps onto hardware as strided convolutions:

- bins are processed one octave at a time, against a signal decimated by 2 per
  octave (half-band windowed-sinc FIR, stride-2 conv), so every kernel bank
  has a short, fixed length regardless of how low the bin's frequency is;
- each octave's 12 complex kernels (hann-windowed exponentials, L1-normalized)
  are a dense ``(2*B, 1, K)`` conv bank applied at the octave's hop — pure
  MXU work, static shapes, ~7 MFLOP per 2-s utterance total.

Scaling follows librosa's ``scale=True`` contract: a unit-amplitude sinusoid
at bin k yields ``|C_k| ≈ 0.5 * sqrt(N_k)`` where ``N_k = Q * sr / f_k`` is
the bin's filter length at the original rate. Absolute scale cancels later in
CQCC's per-utterance ``amplitude_to_db(ref=max)`` anyway; the per-bin
``sqrt(N_k)`` tilt is what matters and is reproduced exactly.

Boundary handling: the signal is zero-padded (librosa.cqt's default
``pad_mode='constant'``) so frame ``m`` is centered at sample ``m * hop``.
Kernel-bank construction is host-side numpy; the compiled path is jnp only.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

C1_HZ = 32.70319566257483  # librosa.note_to_hz('C1') — reference/ASV_dl_func.py:454

# test hooks: force the general (padded) framing/decimation paths so the
# fast strided-view paths can be parity-checked against them
_FORCE_GENERAL_FRAMING = False
_FORCE_PADDED_DECIM = False


def cqt_frequencies(n_bins: int, fmin: float, bins_per_octave: int = 12) -> np.ndarray:
    """Center frequencies ``fmin * 2**(k / B)`` (librosa.cqt_frequencies)."""
    return fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)


def default_n_bins(sr: float, fmin: float = C1_HZ, bins_per_octave: int = 12) -> int:
    """The reference's bin-count rule: floor(log2((sr/2 - 100)/fmin)) * B
    (reference/ASV_dl_func.py:455-456)."""
    fmax = sr / 2.0 - 100.0
    return int(np.floor(np.log2(fmax / fmin)) * bins_per_octave)


@dataclass(frozen=True)
class CQTConfig:
    sr: int = 16000
    hop_length: int = 512
    fmin: float = C1_HZ
    n_bins: int = 84  # default_n_bins(16000) == 84
    bins_per_octave: int = 12
    filter_scale: float = 1.0

    @staticmethod
    def for_sr(sr: int, hop_length: int = 512) -> "CQTConfig":
        return CQTConfig(sr=sr, hop_length=hop_length, n_bins=default_n_bins(sr))

    @property
    def q(self) -> float:
        return self.filter_scale / (2.0 ** (1.0 / self.bins_per_octave) - 1.0)

    @property
    def n_octaves(self) -> int:
        return int(np.ceil(self.n_bins / self.bins_per_octave))

    def lengths(self) -> np.ndarray:
        """Filter length of every bin at the original sample rate."""
        return self.q * self.sr / cqt_frequencies(self.n_bins, self.fmin, self.bins_per_octave)


def _hann(n: int) -> np.ndarray:
    # symmetric hann over the filter support (windows.py owns the formula)
    from audioanalysisdetector_tpu.frontend.windows import get_window

    return get_window("hann", n, periodic=False)


@lru_cache(maxsize=None)
def _octave_kernel_bank(cfg: CQTConfig, octave: int) -> tuple[np.ndarray, int]:
    """Complex kernel bank for one octave at its decimated rate.

    Returns ``(kernels, kernel_len)`` where kernels is ``(2 * n_oct_bins, 1, K)``
    float32 — real parts then imaginary parts — for use as a conv filter bank.

    ``octave`` counts from the TOP: octave 0 holds the highest
    ``bins_per_octave`` bins and runs at the full rate; octave j runs at
    ``sr / 2**j``.
    """
    b = cfg.bins_per_octave
    # bins for this octave (the DEEPEST octave holds the remainder when
    # n_bins % B != 0: hi-lo clamps at the bottom of the bin range)
    hi = cfg.n_bins - octave * b
    lo = max(hi - b, 0)
    freqs = cqt_frequencies(cfg.n_bins, cfg.fmin, b)[lo:hi]
    sr_oct = cfg.sr / (2**octave)
    lens_oct = np.ceil(cfg.q * sr_oct / freqs).astype(int)
    lens_orig = cfg.q * cfg.sr / freqs
    K = int(2 ** np.ceil(np.log2(lens_oct.max())))  # pad bank to pow2 length
    re = np.zeros((len(freqs), K), dtype=np.float64)
    im = np.zeros((len(freqs), K), dtype=np.float64)
    for i, (f, n_k) in enumerate(zip(freqs, lens_oct)):
        t = np.arange(n_k) - (n_k - 1) / 2.0
        w = _hann(n_k)
        w = w / w.sum()  # L1 normalization of the (real) envelope
        phase = 2 * np.pi * f * t / sr_oct
        # scale=True contract: multiply by sqrt(N_k at original sr)
        amp = w * np.sqrt(lens_orig[i])
        start = (K - n_k) // 2
        re[i, start : start + n_k] = amp * np.cos(phase)
        im[i, start : start + n_k] = -amp * np.sin(phase)
    kernels = np.concatenate([re, im], axis=0)[:, None, :].astype(np.float32)
    return kernels, K


@lru_cache(maxsize=None)
def _halfband_fir(numtaps: int = 63, cutoff: float = 0.475) -> np.ndarray:
    """Anti-aliasing FIR for decimation by 2 (kaiser-windowed sinc, gain 1)."""
    from scipy.signal import firwin

    return firwin(numtaps, cutoff, window=("kaiser", 8.0)).astype(np.float32)


_DECIM_BLOCK = 256  # input samples per GEMM block (128 outputs), padded path


@lru_cache(maxsize=None)
def _decim_gemm_matrix(numtaps: int = 63, block: int = _DECIM_BLOCK) -> np.ndarray:
    """Banded-Toeplitz form of the stride-2 half-band FIR.

    ``(block + numtaps - 1, block // 2)``: column t holds the taps aligned
    at output sample t (input offset 2t, rows shifted so row 0 is input
    sample ``-half`` relative to the block start). Mostly zeros — a ~5x
    FLOP overspend that buys the MXU GEMM path. Measured on the target
    runtime: the lax.conv form (width-only, C=1, stride 2) chain took
    22.8 ms per batch-4096 CQT while the GEMM forms take ~1 ms; XLA's TPU
    lowering of single-channel 1-D convs is the bottleneck, not FLOPs.
    """
    h = _halfband_fir(numtaps)
    H = np.zeros((block + numtaps - 1, block // 2), dtype=np.float32)
    for t in range(block // 2):
        H[2 * t : 2 * t + numtaps, t] = h
    return H


@lru_cache(maxsize=None)
def _decim_block_for(n: int) -> int | None:
    """Largest even divisor of ``n`` in [128, 512], or None.

    A divisor block lets the signal reshape into whole blocks for free (no
    global pad copy); [128, 512] keeps the banded operator's FLOP overspend
    ((block+62)/63 ≈ 3-9x) cheap relative to the HBM traffic it saves.

    Block size is a free parameter in practice: forcing 128 / 256 / 512
    across the whole 6-stage batch-4096 chain measured 4.17 / 4.14 / 4.15 ms
    — the stage is HBM-bound (~1.6 GB of traffic ≈ 2.8 ms at the ~575 GB/s
    streaming rate), so the banded zero-FLOPs are hidden and shrinking them
    buys nothing. Measured round 3; revisit only if the memory system changes.
    """
    best = None
    for b in range(128, 513, 2):
        if n % b == 0:
            best = b
    return best


def _decimate2(y: jnp.ndarray) -> jnp.ndarray:
    """Anti-aliased downsample by 2 along the last axis: (..., n) -> (..., n//2).

    Odd-length centered FIR + stride 2 keeps output sample t aligned with
    input sample 2t, so octave frame centers stay aligned across rates.

    Fast path: ``y`` reshapes for free into whole blocks (``_decim_block_for``),
    the 31-sample halos on either side are small slice+pad copies, and the
    whole stage is ONE frames @ H GEMM. One GEMM matters: with separate
    body/halo GEMMs each writes its own full-size output and the adds re-read
    them — measured 9.6 ms for the 6-stage batch-4096 chain vs 7.7 ms for
    this concat-then-one-GEMM form (the padded fallback is the 9.6 ms shape).
    """
    numtaps = 63
    half = numtaps // 2
    n = y.shape[-1]
    lead = y.shape[:-1]
    nd = y.ndim - 1
    block = None if _FORCE_PADDED_DECIM else _decim_block_for(n)
    if block is not None:
        H = _decim_gemm_matrix(numtaps, block)
        nb = n // block
        body = y.reshape(lead + (nb, block))  # free reshape, no pad copy
        prev_tail = jnp.pad(
            body[..., :-1, block - half :], [(0, 0)] * nd + [(1, 0), (0, 0)]
        )
        next_head = jnp.pad(
            body[..., 1:, :half], [(0, 0)] * nd + [(0, 1), (0, 0)]
        )
        frames = jnp.concatenate([prev_tail, body, next_head], axis=-1)
        out = frames @ jnp.asarray(H, dtype=y.dtype)
        return out.reshape(lead + (nb * (block // 2),))
    # fallback (n with no usable divisor): global zero-pad + body/halo GEMMs
    block = _DECIM_BLOCK
    n_blocks = -(-n // block)
    pad_tail = (n_blocks + 1) * block - n + half
    x = jnp.pad(y, [(0, 0)] * nd + [(half, pad_tail)])
    body = x[..., : n_blocks * block].reshape(lead + (n_blocks, block))
    halo = x[..., block : (n_blocks + 1) * block].reshape(
        lead + (n_blocks, block)
    )[..., : numtaps - 1]
    H = _decim_gemm_matrix(numtaps, block)
    out = body @ jnp.asarray(H[:block], dtype=y.dtype) + halo @ jnp.asarray(
        H[block:], dtype=y.dtype
    )
    return out.reshape(y.shape[:-1] + (n_blocks * (block // 2),))[..., : n // 2]


@lru_cache(maxsize=None)
def _octave_dense_operator(
    cfg: CQTConfig, octave: int, n_oct: int, n_frames: int
) -> np.ndarray:
    """Whole-octave analysis as ONE dense operator ``(n_oct, T * 2nb)``.

    For deep octaves the kernel length K far exceeds the octave hop, so
    framing would inflate the tiny decimated signal ~K/hop-fold in HBM; a
    banded dense operator applied as a single signal @ Op GEMM reads the
    signal once. Used when K > 2 * hop (the FLOP overspend of the zero band
    is cheaper than the framing traffic there — measured).
    """
    kernels, K = _octave_kernel_bank(cfg, octave)
    bank = kernels[:, 0, :]  # (2nb, K)
    hop = cfg.hop_length // (2**octave)
    nb2 = bank.shape[0]
    op = np.zeros((n_oct, n_frames * nb2), dtype=np.float32)
    for m in range(n_frames):
        start = m * hop - K // 2  # kernel centered at m*hop, zero-padded edges
        k_lo = max(-start, 0)
        k_hi = min(K, n_oct - start)
        if k_hi <= k_lo:
            continue
        op[start + k_lo : start + k_hi, m * nb2 : (m + 1) * nb2] = bank[
            :, k_lo:k_hi
        ].T
    return op


def cqt(y: jnp.ndarray, cfg: CQTConfig = CQTConfig()) -> jnp.ndarray:
    """Magnitude CQT of ``(..., n)`` waveforms -> ``(..., n_bins, n_frames)``.

    ``n`` must be divisible by ``2**(n_octaves - 1)`` and ``hop_length`` by
    ``2**(n_octaves - 1)`` (both hold for the reference's 2-s 16 kHz chunks
    with hop 512 and 7 octaves).
    """
    div = 2 ** (cfg.n_octaves - 1)
    if cfg.hop_length % div:
        raise ValueError(
            f"hop_length {cfg.hop_length} must be divisible by 2**(n_octaves-1)={div}"
        )
    n_frames = 1 + y.shape[-1] // cfg.hop_length
    if y.shape[-1] % div:
        # zero-pad to the decimation-chain divisor; frame count keeps the
        # original length's contract, so the pad only backs the tail frame's
        # window (librosa zero-pads the signal for CQT as well)
        pad = div - y.shape[-1] % div
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, pad)])
    lead = y.shape[:-1]
    cur = y
    octs: list[jnp.ndarray] = []
    for octave in range(cfg.n_octaves):
        kernels, K = _octave_kernel_bank(cfg, octave)
        hop = cfg.hop_length // (2**octave)
        # analysis as GEMMs (kernel centered at m*hop, zero-padded
        # boundaries) — the equivalent stride-hop lax.conv measured ~60x
        # slower on the target runtime (single-channel 1-D conv lowering),
        # and index-gather framing ~5x slower than shifted-reshape views
        nb = kernels.shape[0] // 2
        n_shift = -(-K // hop)  # overlap factor of the framing layout
        n_cur = cur.shape[-1]
        hb = K // 4  # chunk width of the strided-view framing below
        if (
            not _FORCE_GENERAL_FRAMING
            and n_shift <= 2
            and hb >= 16
            and K % 4 == 0
            and hop % hb == 0
            and n_cur % hb == 0
        ):
            # top octaves, fast path: frame m (window [m*hop - K/2, m*hop + K/2))
            # is 4 width-hb chunks at indices m*(hop//hb) + c - 2, c = 0..3.
            # Each c gives a strided view of the free chunk reshape, consumed
            # by its own slim GEMM against a quarter of the kernel bank; the
            # (n_frames, 2nb) outputs are tiny so the 4-term add is free. This
            # avoids the padded path's global K//2 zero-pad (a full-signal HBM
            # copy — 525 MB for batch 4096 at octave 0) and never materializes
            # the (n_frames, K) frame tensor. Measured (with the one-GEMM
            # decimation): batch-4096 CQT 11.6 -> 8.5 ms.
            s = hop // hb
            nchunks = n_cur // hb
            chunks = cur.reshape(lead + (nchunks, hb))
            bank = jnp.asarray(kernels[:, 0, :], dtype=y.dtype)  # (2nb, K)
            resp = None
            nd = cur.ndim - 1
            for c in range(4):
                start = c - 2  # chunk index used by frame 0
                npf = (-start + s - 1) // s if start < 0 else 0
                i0 = npf * s + start
                lastidx = (n_frames - 1) * s + start
                npb = 0
                i1 = lastidx + 1
                if lastidx > nchunks - 1:
                    npb = -(-(lastidx - (nchunks - 1)) // s)
                    i1 = max((n_frames - 1 - npb) * s + start + 1, i0)
                v = chunks[..., i0:i1:s, :]
                if npf or npb:  # edge frames whose chunk falls outside: zeros
                    v = jnp.pad(v, [(0, 0)] * nd + [(npf, npb), (0, 0)])
                term = v @ bank[:, c * hb : (c + 1) * hb].T
                resp = term if resp is None else resp + term
        elif n_shift <= 2:
            # top octaves, general path: frames from n_shift contiguous views
            need = (n_frames + n_shift) * hop
            xo = jnp.pad(
                cur,
                [(0, 0)] * (cur.ndim - 1)
                + [(K // 2, max(need - cur.shape[-1] - K // 2, 0))],
            )
            frames = jnp.concatenate(
                [
                    xo[..., r * hop : (r + n_frames) * hop].reshape(
                        lead + (n_frames, hop)
                    )
                    for r in range(n_shift)
                ],
                axis=-1,
            )[..., :K]  # (..., n_frames, K)
            bank = jnp.asarray(kernels[:, 0, :], dtype=y.dtype)  # (2nb, K)
            resp = frames @ bank.T  # (..., n_frames, 2 * nb)
        else:
            # deep octaves: one signal @ dense-banded-operator GEMM
            op = _octave_dense_operator(cfg, octave, cur.shape[-1], n_frames)
            resp = (cur @ jnp.asarray(op, dtype=y.dtype)).reshape(
                lead + (n_frames, 2 * nb)
            )
        re, im = resp[..., :nb], resp[..., nb:]
        mag = jnp.sqrt(re * re + im * im)
        octs.append(jnp.swapaxes(mag, -1, -2).reshape(lead + (nb, n_frames)))
        if octave + 1 < cfg.n_octaves:
            cur = _decimate2(cur)
    # octs[0] holds the TOP bins; stack lowest-first to match bin order
    return jnp.concatenate(list(reversed(octs)), axis=-2)
