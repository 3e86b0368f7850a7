"""Pallas TPU kernels (hot-path alternatives to the XLA-fused frontend)."""

from audioanalysisdetector_tpu.ops.ct_mel import ct_log_mel, ct_mel
from audioanalysisdetector_tpu.ops.fused_logmel import (
    fused_log_mel_spectrogram,
    fused_mel_from_frames,
)
from audioanalysisdetector_tpu.ops.wave_mel import wave_log_mel, wave_mel

__all__ = [
    "ct_log_mel",
    "ct_mel",
    "fused_log_mel_spectrogram",
    "fused_mel_from_frames",
    "wave_log_mel",
    "wave_mel",
]
