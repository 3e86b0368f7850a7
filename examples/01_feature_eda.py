"""Feature EDA — the ASV_dataset.ipynb role.

The reference notebook loads utterances one at a time and plots per-feature
histograms. Here every extractor runs BATCHED on device over the whole
corpus in one jitted call per feature, and the per-class statistics the
notebook eyeballed come out as printed tables.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo-root run, no install needed

import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from audioanalysisdetector_tpu.data.synthetic import make_surrogate_corpus
from audioanalysisdetector_tpu.data import prepare_dataframe
from audioanalysisdetector_tpu.frontend import (
    MelConfig,
    cqcc,
    gfcc,
    lfcc,
    log_mel_spectrogram,
    mfcc,
    wpt_energies,
)
from audioanalysisdetector_tpu.io.native_loader import load_chunk_batch_native

SR = 16000


def main() -> None:
    root = tempfile.mkdtemp(prefix="aad_eda_")
    meta, flac_dir = make_surrogate_corpus(
        root, n_bonafide=12, n_spoof_per_tier=4, subset="eda", seed=0
    )

    # metadata -> 2-s chunk rows (the reference's prepare_dataframe contract)
    df = prepare_dataframe(
        {"LA": {"metadata": meta, "flac": [flac_dir]}},
        balance=False,
        extension=".flac",
        rescue_dir=None,
    )
    wav = load_chunk_batch_native(
        list(df["file_path"]), list(df["chunk_start"]), list(df["chunk_end"]), sr=SR
    )
    labels = (df["label"].astype(str).str.lower() == "spoof").to_numpy()
    print(f"{len(df)} chunks ({int((~labels).sum())} bonafide / {int(labels.sum())} spoof)")

    extractors = {
        "mfcc": jax.jit(mfcc),
        "lfcc": jax.jit(lfcc),
        "cqcc": jax.jit(cqcc),
        "gfcc": jax.jit(gfcc),
        "wpt": jax.jit(wpt_energies),
        "log_mel": jax.jit(
            lambda y: log_mel_spectrogram(y, MelConfig(sr=SR, n_mels=64))
        ),
    }

    y = jnp.asarray(wav)
    print(f"\n{'feature':>8} {'shape/utt':>14} {'bonafide mean':>14} {'spoof mean':>12}")
    for name, fn in extractors.items():
        feats = np.asarray(fn(y))
        per_utt = feats.reshape(len(df), -1)
        print(
            f"{name:>8} {str(feats.shape[1:]):>14}"
            f" {per_utt[~labels].mean():>14.4f} {per_utt[labels].mean():>12.4f}"
        )


if __name__ == "__main__":
    main()
