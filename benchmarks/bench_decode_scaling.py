#!/usr/bin/env python
"""Decode-term evidence for the north-star claim (BASELINE.md: >=10k utt/s
per chip, decode -> mel -> CNN-BiLSTM score).

This harness exposes ONE vCPU, so multi-core scaling cannot be measured
here; what CAN be measured hard is the per-core cost of each term:

- ``wav_us_per_utt`` / ``flac_us_per_utt`` — CPU microseconds to decode one
  2-s/16 kHz utterance with the native loader (``time.process_time`` sums
  CPU across the loader's worker threads, so the number is per-CORE cost
  regardless of the thread count used).
- ``*_utt_s_per_core`` — the reciprocal, utterances/sec a single core
  sustains.
- ``cores_for_10k_*`` — cores needed for decode to feed 10k utt/s.
- ``upload_MB_s_needed_10k`` — host->device bytes/sec at 10k utt/s with
  int16 transport (64 KB/utt), to compare against real host DMA vs this
  harness's ~20-40 MB/s tunnel.
- ``threads`` — wall-clock decode rate at 1/2/4 loader threads on THIS
  host (flat on 1 vCPU by construction; the curve documents that the
  binding resource is cores, not the loader's threading).

The full arithmetic combining this with bench.py's compute term lives in
benchmarks/README.md ("North-star decode arithmetic").

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SR, SECONDS = 16000, 2
N_FILES = 512
BATCH = 256
TARGET_UTT_S = 10_000
BYTES_PER_UTT_I16 = SR * SECONDS * 2


def _build_corpus(root: str) -> tuple[list[str], list[str]]:
    from audioanalysisdetector_tpu.io.audio import write_wav
    from audioanalysisdetector_tpu.io.flac import write_flac

    rng = np.random.default_rng(0)
    n = SR * SECONDS
    t = np.arange(n) / SR
    wavs, flacs = [], []
    for i in range(N_FILES):
        # speech-band content so FLAC's predictors see realistic residuals
        y = (
            0.3 * np.sin(2 * np.pi * (110 + 5 * (i % 50)) * t)
            + 0.1 * np.sin(2 * np.pi * (800 + 20 * (i % 30)) * t)
            + 0.03 * rng.standard_normal(n)
        )
        p = os.path.join(root, f"w{i:05d}.wav")
        write_wav(p, y.astype(np.float32), SR)
        wavs.append(p)
        x = np.round(np.clip(y, -0.999, 0.999) * 32767).astype(np.int64)
        p = os.path.join(root, f"f{i:05d}.flac")
        write_flac(p, x, SR)
        flacs.append(p)
    return wavs, flacs


def _measure(paths: list[str], n_threads: int, repeats: int) -> tuple[float, float]:
    """(wall utt/s, CPU µs/utt) for the native batch decoder."""
    from audioanalysisdetector_tpu.io.native_loader import load_chunk_batch_native

    starts = [0.0] * BATCH
    ends = [float(SECONDS)] * BATCH
    load_chunk_batch_native(paths[:BATCH], starts, ends, sr=SR, n_threads=n_threads)
    n_done = 0
    t0, c0 = time.perf_counter(), time.process_time()
    for _ in range(repeats):
        for i in range(0, len(paths), BATCH):
            chunk = paths[i : i + BATCH]
            load_chunk_batch_native(
                chunk, [0.0] * len(chunk), [float(SECONDS)] * len(chunk),
                sr=SR, n_threads=n_threads,
            )
            n_done += len(chunk)
    wall = time.perf_counter() - t0
    cpu = time.process_time() - c0
    return n_done / wall, cpu / n_done * 1e6


def _measure_multichunk(root: str) -> dict:
    """Per-chunk decode cost on multi-chunk FLAC files, grouped vs per-chunk.

    ASVspoof datasets emit one row per 2-s chunk of each file
    (reference/ASV_dl_func.py:247-340); FLAC has no frame seek, so decoding
    chunk k replays frames 0..k. The batch loader groups same-path rows and
    decodes each file's span once — this lane quantifies that win on 6-s
    files (3 chunks each).
    """
    from audioanalysisdetector_tpu.io.flac import write_flac
    from audioanalysisdetector_tpu.io.native_loader import load_chunk_batch_native

    rng = np.random.default_rng(2)
    n_files = 96
    secs = 6
    n = SR * secs
    t = np.arange(n) / SR
    paths = []
    for i in range(n_files):
        y = (
            0.3 * np.sin(2 * np.pi * (110 + 5 * (i % 50)) * t)
            + 0.1 * np.sin(2 * np.pi * (800 + 20 * (i % 30)) * t)
            + 0.03 * rng.standard_normal(n)
        )
        x = np.round(np.clip(y, -0.999, 0.999) * 32767).astype(np.int64)
        p = os.path.join(root, f"m{i:05d}.flac")
        write_flac(p, x, SR)
        paths.append(p)
    chunks = [(p, float(s)) for p in paths for s in range(0, secs, SECONDS)]
    batch_paths = [c[0] for c in chunks]
    starts = [c[1] for c in chunks]
    ends = [s + SECONDS for s in starts]

    def run(grouped: bool, repeats: int) -> float:
        c0 = time.process_time()
        done = 0
        for _ in range(repeats):
            if grouped:
                for i in range(0, len(chunks), BATCH):
                    load_chunk_batch_native(
                        batch_paths[i : i + BATCH], starts[i : i + BATCH],
                        ends[i : i + BATCH], sr=SR, n_threads=1,
                    )
                    done += len(batch_paths[i : i + BATCH])
            else:  # pre-grouping behavior: every chunk decodes its own prefix
                for p, s, e in zip(batch_paths, starts, ends):
                    load_chunk_batch_native([p], [s], [e], sr=SR, n_threads=1)
                    done += 1
        return (time.process_time() - c0) / done * 1e6

    run(True, 1)  # warm cache
    grouped_us = run(True, 3)
    single_us = run(False, 1)
    return {
        "file_seconds": secs,
        "chunks_per_file": secs // SECONDS,
        "grouped_us_per_chunk": round(grouped_us, 1),
        "per_chunk_decode_us": round(single_us, 1),
        "grouped_speedup": round(single_us / grouped_us, 2),
        "grouped_utt_s_per_core": round(1e6 / grouped_us, 1),
    }


def main() -> None:
    import math

    with tempfile.TemporaryDirectory(prefix="bench_decode_") as root:
        wavs, flacs = _build_corpus(root)
        wav_utt_s, wav_us = _measure(wavs, 1, repeats=4)
        flac_utt_s, flac_us = _measure(flacs, 1, repeats=4)
        multichunk = _measure_multichunk(root)
        # nt=1 reuses the (higher-repeat) measurement above instead of
        # re-decoding the whole corpus a third time
        threads_curve = {
            "1": {"wav_utt_s": round(wav_utt_s, 1), "flac_utt_s": round(flac_utt_s, 1)}
        }
        for nt in (2, 4):
            w, _ = _measure(wavs, nt, repeats=2)
            f, _ = _measure(flacs, nt, repeats=2)
            threads_curve[str(nt)] = {"wav_utt_s": round(w, 1), "flac_utt_s": round(f, 1)}

    wav_per_core = 1e6 / wav_us
    flac_per_core = 1e6 / flac_us
    print(json.dumps({
        "metric": "flac_decode_per_core_throughput",
        "value": round(flac_per_core, 1),
        "unit": "utt/s/core",
        "vs_baseline": None,
        "wav_us_per_utt": round(wav_us, 1),
        "flac_us_per_utt": round(flac_us, 1),
        "wav_utt_s_per_core": round(wav_per_core, 1),
        "flac_utt_s_per_core": round(flac_per_core, 1),
        "cores_for_10k_wav": math.ceil(TARGET_UTT_S / wav_per_core),
        "cores_for_10k_flac": math.ceil(TARGET_UTT_S / flac_per_core),
        "bytes_per_utt_i16": BYTES_PER_UTT_I16,
        "upload_MB_s_needed_10k": round(TARGET_UTT_S * BYTES_PER_UTT_I16 / 1e6, 1),
        "host_vcpus_here": os.cpu_count(),
        "multichunk_flac": multichunk,
        "threads": threads_curve,
        "n_files": N_FILES,
        "seconds_per_utt": SECONDS,
    }))


if __name__ == "__main__":
    main()
