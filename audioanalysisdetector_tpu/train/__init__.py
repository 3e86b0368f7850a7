"""Training subsystem (L4): losses, optimizers, metrics, steps, loops."""

from audioanalysisdetector_tpu.train.checkpoint import (
    restore_checkpoint,
    restore_params,
    save_checkpoint,
    save_params,
)
from audioanalysisdetector_tpu.train.loop import (
    EpochLog,
    FitResult,
    batch_iter,
    bilstm_pipeline,
    evaluate,
    fit,
    fit_bucketed,
    would_use_dp,
)
from audioanalysisdetector_tpu.train.gmm_system import (
    add_sequence_deltas,
    eval_model,
    load_bilstm_model,
    load_gmm_feature_fn,
    load_gmm_models,
    make_gmm_feature_fn,
    sequence_cmvn,
    train_gmm_system,
)
from audioanalysisdetector_tpu.train.losses import LOSSES, get_loss
from audioanalysisdetector_tpu.train.metrics import (
    accuracy,
    eer,
    eer_jnp,
    eer_threshold,
    f1_binary,
    f1_macro,
    model_result_metrics,
    roc_curve_np,
)
from audioanalysisdetector_tpu.train.optimizers import OPTIMIZERS, make_optimizer
from audioanalysisdetector_tpu.train.sweep import (
    train_3features,
    train_all_features,
    train_feature_model,
    train_mfca,
)
from audioanalysisdetector_tpu.train.state import TrainState, param_count
from audioanalysisdetector_tpu.train.steps import (
    make_dp_train_step,
    make_eval_step,
    make_train_step,
    replicate,
    shard_batch,
)

__all__ = [
    "EpochLog",
    "FitResult",
    "LOSSES",
    "OPTIMIZERS",
    "TrainState",
    "accuracy",
    "batch_iter",
    "bilstm_pipeline",
    "eer",
    "eer_jnp",
    "eer_threshold",
    "eval_model",
    "evaluate",
    "f1_binary",
    "f1_macro",
    "fit",
    "would_use_dp",
    "fit_bucketed",
    "get_loss",
    "add_sequence_deltas",
    "load_bilstm_model",
    "load_gmm_feature_fn",
    "load_gmm_models",
    "make_gmm_feature_fn",
    "sequence_cmvn",
    "train_gmm_system",
    "make_dp_train_step",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
    "model_result_metrics",
    "param_count",
    "replicate",
    "restore_checkpoint",
    "restore_params",
    "roc_curve_np",
    "save_checkpoint",
    "save_params",
    "shard_batch",
    "train_3features",
    "train_all_features",
    "train_feature_model",
    "train_mfca",
]
