"""Scoring subsystem (L5): batched fused GMM⊕BiLSTM + end-to-end pipelines."""

from audioanalysisdetector_tpu.score.e2e import (
    make_cqcc_fused_scorer,
    make_mel_cnn_bilstm_scorer,
    melspec_features,
)
from audioanalysisdetector_tpu.score.fused import (
    eval_fused,
    fused_scores,
    make_fused_scorer,
    padding_mask,
)

__all__ = [
    "eval_fused",
    "fused_scores",
    "make_cqcc_fused_scorer",
    "make_fused_scorer",
    "make_mel_cnn_bilstm_scorer",
    "melspec_features",
    "padding_mask",
]
