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

import jax
import jax.numpy as jnp
import numpy as np

C1_HZ = 32.70319566257483  # librosa.note_to_hz('C1') — reference/ASV_dl_func.py:454


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
    # symmetric hann over the filter support
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / max(n - 1, 1))


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
    n_oct = cfg.n_octaves
    # bins for this octave (top octave may be partial if n_bins % B != 0)
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
    del n_oct
    return kernels, K


@lru_cache(maxsize=None)
def _halfband_fir(numtaps: int = 63, cutoff: float = 0.475) -> np.ndarray:
    """Anti-aliasing FIR for decimation by 2 (kaiser-windowed sinc, gain 1)."""
    from scipy.signal import firwin

    return firwin(numtaps, cutoff, window=("kaiser", 8.0)).astype(np.float32)


def _decimate2(y: jnp.ndarray) -> jnp.ndarray:
    """Anti-aliased downsample by 2 along the last axis: (..., n) -> (..., n//2).

    Odd-length centered FIR + stride 2 keeps output sample t aligned with
    input sample 2t, so octave frame centers stay aligned across rates.
    """
    h = _halfband_fir()
    pad = len(h) // 2
    x = y.reshape((-1, 1) + y.shape[-1:])
    out = jax.lax.conv_general_dilated(
        x,
        jnp.asarray(h, dtype=y.dtype)[None, None, :],
        window_strides=(2,),
        padding=[(pad, pad)],
    )
    return out.reshape(y.shape[:-1] + (out.shape[-1],))


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
        x = cur.reshape((-1, 1) + cur.shape[-1:])
        resp = jax.lax.conv_general_dilated(
            x,
            jnp.asarray(kernels, dtype=y.dtype),
            window_strides=(hop,),
            padding=[(K // 2, K // 2)],
        )
        resp = resp[..., :n_frames]
        nb = kernels.shape[0] // 2
        re, im = resp[:, :nb], resp[:, nb:]
        mag = jnp.sqrt(re * re + im * im)
        octs.append(mag.reshape(lead + (nb, n_frames)))
        if octave + 1 < cfg.n_octaves:
            cur = _decimate2(cur)
    # octs[0] holds the TOP bins; stack lowest-first to match bin order
    return jnp.concatenate(list(reversed(octs)), axis=-2)
