"""Utilities: profiling subsystem and plotting helpers."""

from audioanalysisdetector_tpu.utils.profiling import (
    StepTimer,
    device_trace,
    profile_fn,
    timed,
)
from audioanalysisdetector_tpu.utils.plotting import plot_coeff_histograms_by_label

__all__ = [
    "StepTimer",
    "device_trace",
    "plot_coeff_histograms_by_label",
    "profile_fn",
    "timed",
]
