"""Batched on-device signal-processing frontend (L1).

Every extractor here is the TPU-native counterpart of a reference extractor
(reference/ASV_dl_func.py:404-538): pure-JAX, static-shape, batched-first —
waveforms come in as ``(..., n_samples)`` arrays, features come out as
``(..., n_coeffs, n_frames)`` arrays, and everything jits.
"""

from audioanalysisdetector_tpu.frontend.cepstral import (
    CepstralConfig,
    gfcc,
    int16_quirk,
    lfcc,
    pre_emphasis,
)
from audioanalysisdetector_tpu.frontend.cqcc import (
    CQCCConfig,
    cqcc,
    cqcc_from_cqt_mag,
    transpose_cqcc,
)
from audioanalysisdetector_tpu.frontend.cqt import (
    C1_HZ,
    CQTConfig,
    cqt,
    cqt_frequencies,
    default_n_bins,
)
from audioanalysisdetector_tpu.frontend.db import amplitude_to_db, power_to_db
from audioanalysisdetector_tpu.frontend.eda import (
    compute_cqt_spec,
    melspectrogram_znorm,
    znorm,
)
from audioanalysisdetector_tpu.frontend.formants import (
    analyze_formants_and_silence,
    burg_lpc,
    formant_tracks,
    intensity_db,
)
from audioanalysisdetector_tpu.frontend.istft import istft
from audioanalysisdetector_tpu.frontend.dct import dct_ii, dct_ii_matrix
from audioanalysisdetector_tpu.frontend.mel import (
    MelConfig,
    hz_to_mel,
    log_mel_spectrogram,
    mel_filterbank,
    mel_to_hz,
    melspectrogram,
)
from audioanalysisdetector_tpu.frontend.mfcc import (
    MFCCConfig,
    add_deltas,
    cmvn,
    delta,
    mfcc,
    mfcc_deltas_cmvn,
)
from audioanalysisdetector_tpu.frontend.stft import (
    frame_signal,
    n_frames_for,
    power_spectrogram,
    stft,
)
from audioanalysisdetector_tpu.frontend.wpt import wavelet_packet_leaves, wpt_energies

__all__ = [
    "C1_HZ",
    "CQCCConfig",
    "CQTConfig",
    "CepstralConfig",
    "analyze_formants_and_silence",
    "burg_lpc",
    "compute_cqt_spec",
    "cqcc",
    "formant_tracks",
    "intensity_db",
    "istft",
    "melspectrogram_znorm",
    "znorm",
    "cqcc_from_cqt_mag",
    "cqt",
    "cqt_frequencies",
    "default_n_bins",
    "gfcc",
    "int16_quirk",
    "lfcc",
    "pre_emphasis",
    "transpose_cqcc",
    "wavelet_packet_leaves",
    "wpt_energies",
    "MelConfig",
    "MFCCConfig",
    "add_deltas",
    "amplitude_to_db",
    "cmvn",
    "dct_ii",
    "dct_ii_matrix",
    "delta",
    "frame_signal",
    "hz_to_mel",
    "log_mel_spectrogram",
    "mel_filterbank",
    "mel_to_hz",
    "melspectrogram",
    "mfcc",
    "mfcc_deltas_cmvn",
    "n_frames_for",
    "power_spectrogram",
    "power_to_db",
    "stft",
]
