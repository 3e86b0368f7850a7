"""XAI over the fused system — the xai_func.py / tets_xai.py role.

Trains a tiny GMM⊕BiLSTM system on the surrogate corpus, then runs every
attribution family the reference has on one instance:

- LIME single-instance surrogate (reference/xai_func.py:178-296)
- Integrated gradients + occlusion over the BiLSTM (reference/tets_xai.py:70-91)
- GMM windowed kernel-SHAP (reference/tets_xai.py:28-67)
- the cross-model comparison dict + top salient time intervals
  (reference/tets_xai.py:94-186)
- the per-coefficient perturbation panel (reference/xai_func.py:465-525)
  and the Grad-CAM-on-mel-axes overlay (ASV_deep_learning.ipynb cell 34),
  rendered into ``<run dir>/xai/``
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo-root run, no install needed

import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from audioanalysisdetector_tpu.data import extract_features, prepare_dataframe
from audioanalysisdetector_tpu.data.scaler import prepare_train_test_data
from audioanalysisdetector_tpu.data.shape_utils import prepare_data_gmm_bilstm
from audioanalysisdetector_tpu.data.synthetic import make_surrogate_corpus
from audioanalysisdetector_tpu.models.gmm import masked_llr
from audioanalysisdetector_tpu.score import make_fused_scorer, padding_mask
from audioanalysisdetector_tpu.train.gmm_system import train_gmm_system
from audioanalysisdetector_tpu.train.loop import bilstm_pipeline
from audioanalysisdetector_tpu.xai import (
    compare_gmm_bilstm,
    extract_top_intervals_global,
    lime_single_instance,
)

SR = 16000


def main() -> None:
    root = tempfile.mkdtemp(prefix="aad_xai_")
    meta, flac_dir = make_surrogate_corpus(root, n_bonafide=16, n_spoof_per_tier=6)
    df = prepare_dataframe(
        {"LA": {"metadata": meta, "flac": [flac_dir]}},
        balance=False, extension=".flac", rescue_dir=None,
    )
    df = extract_features(df, ["cqcc"], sr=SR)
    df = prepare_data_gmm_bilstm(df)
    y = (df["label"].astype(str).str.lower() == "spoof").to_numpy().astype(int)
    x = np.stack([np.asarray(c, np.float32) for c in df["cqcc"]])
    x, _, _ = prepare_train_test_data(x, x[:1], scaler_path=None)

    result, _ = bilstm_pipeline(
        (x, y), (x, y), num_epochs=4, batch_size=32, model_dir=root, verbose=False
    )
    _, g_gen, g_spoof = train_gmm_system(x, y, n_components=16, model_dir=root)
    apply_fn = result.best_state.apply_fn
    variables = {"params": result.best_state.params}

    instance = x[int(np.argmax(y))]  # one spoof chunk, (T=63, F=19) scaled

    # 1. LIME over the FUSED scorer. lime takes (F, T) maps; the fused
    # scorer takes time-major (T, F) — the transpose lives INSIDE the jit
    # (eager jnp ops cost seconds per dispatch on tunneled TPU runtimes).
    fused = make_fused_scorer(apply_fn, variables, g_gen, g_spoof)
    fused_ft = jax.jit(lambda b: fused(jnp.swapaxes(b, -1, -2)))
    lime = lime_single_instance(fused_ft, instance.T, mode="feature")
    print(f"LIME: score {lime['score']:.3f}, top coefficients {lime['top_components']}")

    # 2-4. IG + occlusion + GMM windowed SHAP + comparison, one call.
    # Spoof-polarity LLR (spoof model first), matching score/fused.py's
    # arm — so the SHAP map's sign agrees with the BiLSTM maps' target=spoof
    def gmm_prob(batch):  # (B, T, F) -> P(spoof) via sigmoid LLR
        mask = padding_mask(batch)
        return jax.nn.sigmoid(masked_llr(batch, mask, g_spoof, g_gen))

    cmp = compare_gmm_bilstm(
        instance,
        bilstm_apply=apply_fn,
        bilstm_variables=variables,
        gmm_score_fn=jax.jit(gmm_prob),
        shap_coalitions=64,
    )
    for name, hm in cmp["heatmaps"].items():
        print(f"{name:>16}: heatmap {hm.shape}, |mean| {np.abs(hm).mean():.4f}")

    # the reference's 1e-2 threshold suits its real-data saliency scale;
    # the tiny surrogate model's attributions are ~1e-4, so scale it down
    intervals = extract_top_intervals_global(
        cmp["heatmaps"]["bilstm_occlusion"], sr=SR, threshold=1e-4
    )
    print("top salient intervals (s):", [(round(a, 2), round(b, 2)) for a, b, *_ in intervals][:3])

    # 5. Figures: the reference's per-coefficient perturbation panel
    # (xai_func.py:465-525) on a LIME-style feature perturbation, and the
    # notebook's Grad-CAM overlay on the mel spectrogram's own axes.
    from audioanalysisdetector_tpu.frontend.mel import MelConfig, log_mel_spectrogram
    from audioanalysisdetector_tpu.io import load_audio
    from audioanalysisdetector_tpu.models.resnet import AntiSpoofingResNet
    from audioanalysisdetector_tpu.xai import (
        grad_cam,
        perturb_random_features_mean,
        plot_cqcc_pipeline,
        plot_gradcam_overlay,
    )

    fig_dir = os.path.join(root, "xai")
    feat_ft = instance.T  # (F=19, T=63), coeffs-first for the panel
    pert, mask = perturb_random_features_mean(
        jnp.asarray(feat_ft), jax.random.PRNGKey(0), n_changed=4
    )
    panel = plot_cqcc_pipeline(
        feat_ft, np.asarray(pert), {"mode": "feature", "mask": np.asarray(mask)},
        out_path=os.path.join(fig_dir, "cqcc_pipeline.png"),
    )

    wav, _ = load_audio(df["file_path"].iloc[int(np.argmax(y))], sr=SR)
    mel_cfg = MelConfig(sr=SR, n_mels=64)
    mel = jax.jit(lambda w: log_mel_spectrogram(w, mel_cfg))(jnp.asarray(wav)[None])
    resnet = AntiSpoofingResNet()
    r_vars = resnet.init(jax.random.PRNGKey(0), mel, train=False)
    cam = jax.jit(lambda v, f: grad_cam(resnet, v, f))(r_vars, mel)
    overlay = plot_gradcam_overlay(
        np.asarray(mel[0]), np.asarray(cam[0]), sr=SR,
        hop_length=mel_cfg.hop_length, fmax=mel_cfg.fmax,
        out_path=os.path.join(fig_dir, "gradcam_overlay.png"),
    )
    print("figures:", panel, overlay)


if __name__ == "__main__":
    main()
