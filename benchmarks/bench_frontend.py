#!/usr/bin/env python
"""Per-extractor frontend throughput on device-resident 2-s waveform batches."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from audioanalysisdetector_tpu.data.pipeline import default_extractors

    B = 2048
    wav = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(0), (B, 32000), jnp.float32) * 0.1
    )
    results = {}
    for name, fn in default_extractors(16000).items():
        jitted = jax.jit(fn)
        jax.block_until_ready(jitted(wav))  # compile
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(jitted(wav))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        results[name] = {"ms_per_batch": round(dt * 1e3, 2), "utt_per_sec": round(B / dt)}
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
