#!/usr/bin/env python
"""Serving-layer benchmark: HTTP + micro-batcher vs direct scorer calls.

Measures the flagship mel -> CNN-BiLSTM service under concurrent clients
posting binary (pcm_b64) requests, against a direct-call lane pushing the
same rows through the same jitted scorer with no HTTP/batching in between.
The delta is the serving layer's true overhead; on this harness the
absolute number is tunnel-bound (~20-40 MB/s host->device, ~69 ms scalar
fetch — see benchmarks/README.md), so the overhead ratio is the signal,
not the utt/s.

Two served lanes isolate the dispatch-size ladder: ``served_fixed`` pads
every partial batch to max_batch (one compiled shape), ``served_bucketed``
pads up to the smallest bucket that holds the rows (ladder of compiled
shapes). On a padding-heavy arrival pattern the ladder saves the dead-row
upload + compute, which on this tunnel (~32 MB per full dispatch) is the
dominant cost.

Run: python benchmarks/bench_serve.py [n_clients rows_per_req n_requests]
"""

import base64
import json
import os
import math
import sys
import threading
import time
import urllib.request

import numpy as np


def main() -> None:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
    from audioanalysisdetector_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from audioanalysisdetector_tpu.serve import (
        BatchingScorer,
        ScoreServer,
        build_mel_scorer,
    )

    n_clients = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rows_per_req = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_requests = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    max_batch = 256

    scorer, n_samples = build_mel_scorer(sr=16000, seconds=2.0)
    rng = np.random.default_rng(0)
    rows = (rng.standard_normal((rows_per_req, n_samples)) * 0.1).astype("<f4")

    # warm-up: the service's single compiled shape
    scorer(np.zeros((max_batch, n_samples), np.float32))

    # ---- direct lane: same rows, same scorer, no HTTP/batching ----
    total_rows = n_requests * rows_per_req
    t0 = time.perf_counter()
    done = 0
    while done < total_rows:
        batch = np.zeros((max_batch, n_samples), np.float32)
        k = min(max_batch, total_rows - done)
        batch[:k] = np.repeat(rows, (k + rows_per_req - 1) // rows_per_req, axis=0)[:k]
        float(np.asarray(scorer(batch)).sum())  # fetch-forced
        done += k
    direct_s = time.perf_counter() - t0
    direct_utt_s = total_rows / direct_s

    # ---- served lanes: concurrent HTTP clients, binary payload ----
    payload_rows = rows

    def run_served(bucket_sizes):
        batcher = BatchingScorer(
            scorer,
            n_samples=n_samples,
            max_batch=max_batch,
            max_wait_ms=5.0,
            bucket_sizes=bucket_sizes,
        )
        batcher.warm_up()
        server = ScoreServer(batcher, sr=16000, port=0)
        server.start_background()
        url = f"http://127.0.0.1:{server.port}/v1/score"
        payload = json.dumps(
            {
                "pcm_b64": base64.b64encode(payload_rows.tobytes()).decode(),
                "rows": rows_per_req,
            }
        ).encode()

        latencies: list[float] = []
        lat_lock = threading.Lock()
        work = list(range(n_requests))
        work_lock = threading.Lock()

        errors: list = []

        def client():
            while True:
                with work_lock:
                    if not work:
                        return
                    work.pop()
                t = time.perf_counter()
                req = urllib.request.Request(
                    url, data=payload, headers={"Content-Type": "application/json"}
                )
                with urllib.request.urlopen(req, timeout=300) as r:
                    out = json.loads(r.read())
                if "scores" not in out or len(out["scores"]) != rows_per_req:
                    # fail LOUDLY: a silent client death after popping a
                    # work item would skew utt_per_s (total_rows / wall)
                    errors.append(out)
                    return
                with lat_lock:
                    latencies.append(time.perf_counter() - t)

        threads = [threading.Thread(target=client) for _ in range(n_clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        served_s = time.perf_counter() - t0
        if errors:
            raise RuntimeError(f"server returned errors: {errors[:3]}")
        stats = batcher.stats.snapshot()
        server.close()
        lat = np.sort(latencies)
        return {
            "utt_per_s": round(total_rows / served_s, 1),
            "overhead_pct": round(100 * (served_s / direct_s - 1), 1),
            "p50_latency_ms": round(1000 * lat[len(lat) // 2], 1),
            "p95_latency_ms": round(1000 * lat[min(math.ceil(len(lat) * 0.95) - 1, len(lat) - 1)], 1),
            "batcher": stats,
        }

    fixed = run_served(None)
    from audioanalysisdetector_tpu.serve.server import default_bucket_ladder

    ladder = default_bucket_ladder(max_batch)
    bucketed = run_served(ladder)

    print(
        json.dumps(
            {
                "direct_utt_per_s": round(direct_utt_s, 1),
                "served_fixed": fixed,
                "served_bucketed": {**bucketed, "buckets": list(ladder)},
                "clients": n_clients,
                "rows_per_req": rows_per_req,
                "total_rows": total_rows,
            }
        )
    )


if __name__ == "__main__":
    main()
