"""Float64 numpy golden references with librosa-documented semantics.

librosa/spafe are not installed in this environment, so parity is checked
against (a) these independent float64 implementations of the published
formulas, and (b) third-party numerics where available: ``torch.stft`` for
the STFT (same center/reflect/periodic-Hann conventions as librosa) and
``scipy.fftpack.dct`` / ``scipy.signal.savgol_filter`` for DCT and deltas.
"""

from __future__ import annotations

import numpy as np
from scipy.fftpack import dct as scipy_dct


def hann_periodic(n: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)


def stft_ref(y: np.ndarray, n_fft: int, hop: int, win_length: int | None = None) -> np.ndarray:
    """Center-padded (reflect) STFT -> (n_fft//2+1, n_frames), complex128."""
    win_length = n_fft if win_length is None else win_length
    w = hann_periodic(win_length)
    lpad = (n_fft - win_length) // 2
    w_full = np.zeros(n_fft)
    w_full[lpad : lpad + win_length] = w
    ypad = np.pad(y.astype(np.float64), n_fft // 2, mode="reflect")
    n_frames = 1 + (len(ypad) - n_fft) // hop
    out = np.empty((n_fft // 2 + 1, n_frames), dtype=np.complex128)
    for t in range(n_frames):
        frame = ypad[t * hop : t * hop + n_fft] * w_full
        out[:, t] = np.fft.rfft(frame)
    return out


def hz_to_mel_ref(f, htk=False):
    f = np.asanyarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        f >= min_log_hz,
        min_log_mel + np.log(np.maximum(f, min_log_hz) / min_log_hz) / logstep,
        f / f_sp,
    )


def mel_to_hz_ref(m, htk=False):
    m = np.asanyarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f_sp * m)


def mel_fb_ref(sr, n_fft, n_mels, fmin=0.0, fmax=None, htk=False, norm="slaney"):
    fmax = sr / 2 if fmax is None else fmax
    fftfreqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_f = mel_to_hz_ref(np.linspace(hz_to_mel_ref(fmin, htk), hz_to_mel_ref(fmax, htk), n_mels + 2), htk)
    weights = np.zeros((n_mels, len(fftfreqs)))
    fdiff = np.diff(mel_f)
    ramps = np.subtract.outer(mel_f, fftfreqs)
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
        weights *= enorm[:, None]
    return weights


def power_to_db_ref(S, ref=1.0, amin=1e-10, top_db=80.0):
    S = np.asarray(S, dtype=np.float64)
    ref_val = np.max(S) if ref == "max" else ref
    log_spec = 10.0 * np.log10(np.maximum(amin, S)) - 10.0 * np.log10(np.maximum(amin, ref_val))
    if top_db is not None:
        log_spec = np.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


def amplitude_to_db_ref(S, ref=1.0, amin=1e-5, top_db=80.0):
    ref_sq = "max" if ref == "max" else ref**2
    return power_to_db_ref(np.square(S), ref=ref_sq, amin=amin**2, top_db=top_db)


def melspectrogram_ref(y, sr, n_fft=2048, hop=512, n_mels=128, fmin=0.0, fmax=None, power=2.0):
    S = np.abs(stft_ref(y, n_fft, hop)) ** power
    fb = mel_fb_ref(sr, n_fft, n_mels, fmin, fmax)
    return fb @ S


def mfcc_ref(y, sr, n_mfcc=13, n_mels=128, n_fft=2048, hop=512):
    S_db = power_to_db_ref(melspectrogram_ref(y, sr, n_fft, hop, n_mels))
    return scipy_dct(S_db, type=2, axis=0, norm="ortho")[:n_mfcc]


def cqt_ref(y, sr, hop, fmin, n_bins, bins_per_octave=12, filter_scale=1.0):
    """Direct-definition float64 magnitude CQT at the ORIGINAL sample rate.

    Per-bin L1-normalized symmetric-hann-windowed complex correlation with
    the bin's exponential, librosa ``scale=True`` (sqrt(N_k)) scaling and
    length rule ``N_k = ceil(Q * sr / f_k)``, zero-padded boundaries, frame m
    centered at sample ``m * hop`` (librosa.cqt's pad_mode='constant'
    contract; reference/ASV_dl_func.py:442-481 consumes librosa.cqt).

    No decimation pyramid, no FFT — this is the definition the fast
    multi-octave implementation is bounded against.
    """
    y = np.asarray(y, np.float64)
    q = filter_scale / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    freqs = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
    n_frames = 1 + len(y) // hop
    out = np.zeros((n_bins, n_frames))
    for k, f in enumerate(freqs):
        n_k = int(np.ceil(q * sr / f))
        i = np.arange(n_k)
        t = i - (n_k - 1) / 2.0
        w = 0.5 - 0.5 * np.cos(2 * np.pi * i / max(n_k - 1, 1))
        w = w / w.sum()
        kern = w * np.exp(-2j * np.pi * f * t / sr) * np.sqrt(q * sr / f)
        idx = (np.arange(n_frames) * hop - n_k // 2)[:, None] + i[None, :]
        valid = (idx >= 0) & (idx < len(y))
        seg = np.where(valid, y[np.clip(idx, 0, len(y) - 1)], 0.0)
        out[k] = np.abs(seg @ kern)
    return out


def cqcc_ref(y, sr, hop=512, fmin=32.70319566257483, n_bins=84, n_ceps=19):
    """Float64 CQCC chain on cqt_ref (reference/ASV_dl_func.py:442-481):
    amplitude_to_db(ref=max) -> per-frame linear-grid re-interpolation ->
    log(x^2 + 1e-12) -> orthonormal DCT-II over frequency -> first n_ceps."""
    mag = cqt_ref(y, sr, hop, fmin, n_bins)
    db = amplitude_to_db_ref(mag, ref=float(mag.max()))
    src = fmin * 2.0 ** (np.arange(n_bins) / 12)
    dst = np.linspace(src.min(), src.max(), num=n_bins)
    interp = np.empty_like(db)
    for m in range(db.shape[1]):
        interp[:, m] = np.interp(dst, src, db[:, m])
    logp = np.log(interp**2 + 1e-12)
    return scipy_dct(logp, type=2, axis=0, norm="ortho")[:n_ceps]
