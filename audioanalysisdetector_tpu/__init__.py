"""audioanalysisdetector_tpu — TPU-native audio deepfake detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
IzaP1k/AudioAnalysisDetector (ASVspoof-style bonafide/spoof audio classification):

- ``frontend``: batched on-device DSP (STFT, log-mel, MFCC+deltas+CMVN, LFCC,
  CQT->CQCC, GFCC, wavelet-packet energies) with librosa/spafe-parity semantics.
- ``data``:     metadata ingestion (ASVspoof LA/PA/DF schemas), 2-s chunking,
  balancing, augmentation policy, batched host->device feed.
- ``models``:   CNN-BiLSTM hybrid with attention (flagship), anti-spoofing ResNet,
  stacked BiLSTM, multi-feature fusion, GMM-UBM with MAP adaptation — all JAX.
- ``train``:    jit/shard_map data-parallel training, loss & optimizer zoos,
  accuracy/F1/EER metrics, checkpointing, sweep drivers.
- ``score``:    batched fused GMM (+) BiLSTM spoof scorer.
- ``xai``:      grad saliency, integrated gradients, occlusion, Grad-CAM,
  LIME-style perturbation surrogates, windowed SHAP analogue.
- ``parallel``: device-mesh utilities (data parallelism over ICI via shard_map).
- ``ops``:      Pallas TPU kernels for the hot paths.

Everything computes in static shapes under jit; scalar Python control flow is
kept out of the compiled path.
"""

__version__ = "0.1.0"

from audioanalysisdetector_tpu.frontend import (  # noqa: F401
    MelConfig,
    MFCCConfig,
    log_mel_spectrogram,
    melspectrogram,
    mfcc,
    power_to_db,
    amplitude_to_db,
    stft,
)
