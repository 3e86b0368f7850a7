"""Waveform augmentation — the data_augmentation.ipynb role.

The reference notebook applies each augmentation to one file and saves it
for listening. Here the augmentations are ON-DEVICE batched transforms
(reference/ASV_dl_func.py:78-93 semantics, noise default fixed to 0.005 —
the reference's 1.022 drowns the signal, SURVEY §7), plus the 0.8/0.5
dataset expansion policy applied to a chunk DataFrame.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo-root run, no install needed

import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from audioanalysisdetector_tpu.data import add_data_augmentation, prepare_dataframe
from audioanalysisdetector_tpu.data.augment import (
    add_noise,
    pitch_shift,
    spec_augment,
    time_shift,
)
from audioanalysisdetector_tpu.data.synthetic import make_surrogate_corpus, synth_bonafide
from audioanalysisdetector_tpu.io.audio import write_wav

SR = 16000


def main() -> None:
    out_dir = tempfile.mkdtemp(prefix="aad_aug_")
    rng = np.random.default_rng(0)
    y = jnp.asarray(synth_bonafide(rng, 2 * SR, SR), jnp.float32)[None]  # (1, n)
    key = jax.random.PRNGKey(0)

    variants = {
        "original": y,
        "noise": jax.jit(add_noise)(y, key),
        "pitch": jax.jit(lambda w: pitch_shift(w, n_steps=2.0))(y),
        "time_shift": jax.jit(time_shift)(y, key),
    }
    for name, wav in variants.items():
        path = os.path.join(out_dir, f"{name}.wav")
        host = np.asarray(wav[0])  # one fetch; stats in numpy (never eager jnp)
        write_wav(path, host, SR)
        print(f"{name:>10}: rms {float(np.sqrt(np.mean(host**2))):.4f} -> {path}")

    # SpecAugment operates on feature maps, not waveforms
    feats = jnp.ones((1, 64, 63))
    masked = np.asarray(jax.jit(spec_augment)(feats, key))
    print(f"spec_augment: {float((masked == 0).mean()):.1%} of the map masked")

    # the 0.8/0.5 expansion policy (reference/ASV_dl_func.py:96-127): with
    # p=0.8 append one augmented copy per row, with p=0.5 a 2-aug pair
    root = tempfile.mkdtemp(prefix="aad_aug_corpus_")
    meta, flac_dir = make_surrogate_corpus(root, n_bonafide=6, n_spoof_per_tier=2)
    df = prepare_dataframe(
        {"LA": {"metadata": meta, "flac": [flac_dir]}},
        balance=False, extension=".flac", rescue_dir=None,
    )
    expanded = add_data_augmentation(df, seed=0)
    print(
        f"expansion policy: {len(df)} rows -> {len(expanded)} "
        f"({expanded['augmentationType'].notna().sum()} augmented copies)"
    )


if __name__ == "__main__":
    main()
