"""Model zoo (L3) — flax modules + JAX GMM, reference-parity architectures."""

from audioanalysisdetector_tpu.models.bilstm_classifier import BiLSTMClassifier
from audioanalysisdetector_tpu.models.cnn_bilstm import CNNBiLSTMHybrid
from audioanalysisdetector_tpu.models.gmm import (
    DiagGMM,
    component_log_prob,
    compute_llr,
    fit_em,
    from_numpy,
    map_adapt,
    masked_llr,
    predict_proba,
    score,
    score_samples,
    to_numpy,
)
from audioanalysisdetector_tpu.models.lstm import BiLSTM, LSTMLayer
from audioanalysisdetector_tpu.models.mobilenet_mfca import (
    MFCAModule,
    MobileNetMFCA,
    MobileNetV2Features,
)
from audioanalysisdetector_tpu.models.resnet import (
    AntiSpoofingResNet,
    ExtractFeatureResidual,
    MoreFeaturesClassifier,
    ResidualBlock,
    ResNetTrunk,
)

__all__ = [
    "AntiSpoofingResNet",
    "BiLSTM",
    "BiLSTMClassifier",
    "CNNBiLSTMHybrid",
    "DiagGMM",
    "ExtractFeatureResidual",
    "LSTMLayer",
    "MFCAModule",
    "MobileNetMFCA",
    "MobileNetV2Features",
    "MoreFeaturesClassifier",
    "ResNetTrunk",
    "ResidualBlock",
    "component_log_prob",
    "compute_llr",
    "fit_em",
    "from_numpy",
    "map_adapt",
    "masked_llr",
    "predict_proba",
    "score",
    "score_samples",
    "to_numpy",
]
