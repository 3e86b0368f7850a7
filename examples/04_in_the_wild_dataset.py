""""In the wild" dataset CSVs — the get_new_data.ipynb role.

The reference notebook walks a ``dir/{train,val,test}/{label}/file``
layout, probes durations, chunks every file into 2-s rows, and writes
rescue CSVs. `data.prepare_dirs_dataset` is that builder (reference
/ASV_dl_func.py:165-244, balancing thresholds included).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo-root run, no install needed

import tempfile

import numpy as np

from audioanalysisdetector_tpu.data import prepare_dirs_dataset
from audioanalysisdetector_tpu.data.synthetic import synth_bonafide, synth_spoof
from audioanalysisdetector_tpu.io.audio import write_wav

SR = 16000


def main() -> None:
    root = tempfile.mkdtemp(prefix="aad_wild_")
    rng = np.random.default_rng(0)
    # durations vary so chunk counts differ per file (4 s -> 2 rows, etc.)
    for subset, n_files in [("train", 6), ("val", 3), ("test", 3)]:
        for label, synth in [
            ("real", lambda n: synth_bonafide(rng, n, SR)),
            ("fake", lambda n: synth_spoof(rng, n, SR, "A01")),
        ]:
            d = os.path.join(root, subset, label)
            os.makedirs(d)
            for i in range(n_files):
                seconds = int(rng.integers(2, 6))
                write_wav(os.path.join(d, f"{i}.wav"), synth(seconds * SR), SR)

    out_dir = tempfile.mkdtemp(prefix="aad_wild_csv_")
    dfs = prepare_dirs_dataset(
        root,
        balance=False,
        min_per_class={"train": 1, "val": 1, "test": 1},
        rescue_dir=out_dir,  # the reference's *_ratunkowe.csv snapshots
    )
    for df in dfs:
        subset = df["set"].iloc[0]
        print(
            f"{subset}: {len(df)} chunks from "
            f"{df['filepath'].nunique()} files — labels "
            f"{ {k: int(v) for k, v in df['label'].value_counts().items()} }"
        )
    print("rescue CSVs:", sorted(os.listdir(out_dir)))


if __name__ == "__main__":
    main()
