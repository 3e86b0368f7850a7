"""Scoring subsystem (L5): batched fused GMM⊕BiLSTM + end-to-end pipelines."""

from audioanalysisdetector_tpu.score.e2e import (
    make_cqcc_fused_scorer,
    make_mel_cnn_bilstm_scorer,
    melspec_features,
)
from audioanalysisdetector_tpu.score.streaming import (
    score_paths,
    stream_decode_batches,
)
from audioanalysisdetector_tpu.score.fused import (
    arm_scores,
    eval_fused,
    fit_decision_threshold,
    fit_llr_calibration,
    fused_scores,
    make_arm_scorer,
    make_fused_scorer,
    padding_mask,
)

__all__ = [
    "arm_scores",
    "eval_fused",
    "fit_decision_threshold",
    "fit_llr_calibration",
    "fused_scores",
    "make_arm_scorer",
    "make_cqcc_fused_scorer",
    "make_fused_scorer",
    "make_mel_cnn_bilstm_scorer",
    "melspec_features",
    "padding_mask",
    "score_paths",
    "stream_decode_batches",
]
