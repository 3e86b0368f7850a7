"""Streaming file scoring — decode overlapped with device compute (L5).

Library form of the CLI's production streaming shape: a producer thread
fills fixed-size waveform batches through the native threaded decoder
(io/native_loader: C++ WAV + in-repo FLAC) while the consumer scores the
previous batch on device, so decode/upload hide behind compute. The
reference has no equivalent (its ``eval_model`` decodes and scores one
utterance at a time with a host↔device round trip per sample,
reference/ASV_dl_func.py:1467-1515).

Teardown contract: the producer exits promptly when the consumer stops
consuming — abandoned generators, raising scorers, and normal exhaustion
all set the cancellation event and drain the queue (tested in
tests/test_cli.py::test_stream_producer_dies_with_consumer).
"""

from __future__ import annotations

import queue
import sys
import threading
from typing import Callable, Iterator

import numpy as np


def stream_decode_batches(
    paths: list[str],
    *,
    seconds: float = 2.0,
    sr: int = 16000,
    batch_size: int = 512,
    warn_stream=None,
) -> Iterator[tuple[list[str], np.ndarray]]:
    """Yield ``(kept_paths, (batch_size, n) float32)`` decode batches.

    Decode runs on a producer thread (overlapping the consumer's compute);
    unreadable rows are dropped with a warning (the reference's
    failure->skip policy); the tail batch is padded by repeating its last
    row so a jitted scorer compiles exactly once — rows beyond
    ``len(kept_paths)`` are padding.
    """
    from audioanalysisdetector_tpu.io.native_loader import load_chunk_batch_native

    warn_stream = warn_stream if warn_stream is not None else sys.stderr
    q: queue.Queue = queue.Queue(maxsize=2)
    cancel = threading.Event()  # set by the consumer's finally: stop producing

    def _put(item) -> bool:
        """Bounded put that gives up when the consumer is gone — a dead
        consumer must never leave the producer parked on a full queue."""
        while not cancel.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        # any failure MUST still unblock the consumer: the sentinel goes out
        # via finally, and an exception is forwarded through the queue
        try:
            for i in range(0, len(paths), batch_size):
                if cancel.is_set():
                    return
                chunk = paths[i : i + batch_size]
                out, ok = load_chunk_batch_native(
                    chunk,
                    [0.0] * len(chunk),
                    [float(seconds)] * len(chunk),
                    sr=sr,
                    return_ok=True,
                )
                for p, good in zip(chunk, ok):
                    if not good:
                        print(f"WARNING: cannot read {p}: skipped", file=warn_stream)
                kept = [p for p, good in zip(chunk, ok) if good]
                out = out[ok]
                if len(kept) == 0:
                    continue
                if out.shape[0] < batch_size:  # pad tail; extra rows are ignored
                    out = np.concatenate(
                        [out, np.repeat(out[-1:], batch_size - out.shape[0], axis=0)]
                    )
                if not _put((kept, out)):
                    return
        except BaseException as e:  # noqa: BLE001 — forwarded to the consumer
            _put(e)
        finally:
            _put(None)

    th = threading.Thread(target=producer, daemon=True)
    th.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # runs on normal exhaustion, consumer exceptions, AND abandoned
        # generators (GeneratorExit): wake any blocked put, drain, reap
        cancel.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        th.join(timeout=10.0)


def score_paths(
    scorer: Callable[[np.ndarray], np.ndarray],
    paths: list[str],
    *,
    seconds: float = 2.0,
    sr: int = 16000,
    batch_size: int = 512,
) -> tuple[list[str], np.ndarray]:
    """Score audio files through a jitted batch scorer, streaming.

    ``scorer``: ``(batch_size, n_samples) -> (batch_size,)`` (e.g.
    ``score.e2e.make_mel_cnn_bilstm_scorer``). Score vectors are fetched
    only after every batch has been dispatched, so uploads and device
    compute overlap without per-batch host syncs. Returns
    ``(kept_paths, scores)`` aligned; unreadable files are skipped.
    """
    import jax.numpy as jnp

    pending: list[tuple[list[str], object]] = []
    for kept, batch_np in stream_decode_batches(
        paths, seconds=seconds, sr=sr, batch_size=batch_size
    ):
        pending.append((kept, scorer(jnp.asarray(batch_np))))
    all_paths: list[str] = []
    parts: list[np.ndarray] = []
    for kept, dev_scores in pending:
        all_paths.extend(kept)
        parts.append(np.asarray(dev_scores)[: len(kept)])
    scores = np.concatenate(parts) if parts else np.empty((0,), np.float32)
    return all_paths, scores
