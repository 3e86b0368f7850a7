"""Pallas TPU kernels (hot-path alternatives to the XLA-fused frontend)."""

from audioanalysisdetector_tpu.ops.fused_logmel import (
    fused_log_mel_spectrogram,
    fused_mel_from_frames,
)

__all__ = ["fused_log_mel_spectrogram", "fused_mel_from_frames"]
