#!/usr/bin/env python
"""Per-extractor frontend throughput on device-resident 2-s waveform batches.

Timing is execution-forced: every iteration is one jitted dispatch that
consumes the previous iteration's scalar accumulator, and the final value is
fetched (on remote TPU runtimes block_until_ready does not block).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from audioanalysisdetector_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from audioanalysisdetector_tpu.data.pipeline import default_extractors

    B = 2048
    n_iters = 40
    wav = jax.random.normal(jax.random.PRNGKey(0), (B, 32000), jnp.float32) * 0.1
    results = {}
    for name, fn in default_extractors(16000).items():
        def step(w, acc, fn=fn):
            out = fn(w)  # acc serializes via the output-side reduction only
            return acc + jnp.sum(out, dtype=jnp.float32)

        chained = jax.jit(step)
        acc = chained(wav, jnp.zeros((), jnp.float32))
        float(acc)  # compile + force
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(n_iters):
            acc = chained(wav, acc)
        float(acc)
        dt = (time.perf_counter() - t0) / n_iters
        results[name] = {"ms_per_batch": round(dt * 1e3, 2), "utt_per_sec": round(B / dt)}
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
