#!/usr/bin/env python
"""UBM training benchmark — the reference's slowest phase.

Reference numbers (ASV_deep_learning.ipynb cell 25, CPU sklearn):
  UBM EM, 128 diag components, 100 iters, ~1.8M CQCC frames: 478.85 s
  MAP adaptation, 2 classes x 20 iters:                        87.11 s

This script fits the same-sized problem with the on-device chunked-GEMM EM
(models/gmm.py) and reports both phases.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax.numpy as jnp

    from audioanalysisdetector_tpu.models.gmm import fit_em, map_adapt
    from audioanalysisdetector_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    n_frames, dim, k = 1_800_000, 19, 128
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((8, dim)) * 2
    assign = rng.integers(0, 8, n_frames)
    x = (centers[assign] + rng.standard_normal((n_frames, dim))).astype(np.float32)

    import jax

    # the pipeline uploads frames ONCE; EM and both MAP adaptations share
    # the buffer (train/gmm_system.py). Upload is timed separately — it is
    # tunnel bandwidth, not compute.
    t0 = time.time()
    xd = jax.device_put(x)
    assert np.isfinite(float(jnp.sum(xd[0])))  # force the transfer
    t_upload = time.time() - t0

    t0 = time.time()
    ubm = fit_em(xd, k, max_iter=100, tol=0.0, seed=42)  # tol=0: full 100 iters
    assert np.isfinite(float(jnp.sum(ubm.means)))  # force the async chain
    t_ubm = time.time() - t0

    half = n_frames // 2
    # both class masks built on HOST and placed once — eager jnp ops here
    # (and especially inside the timed region, e.g. an eager `1.0 - w` on a
    # 1.8M-element device array) are op-by-op tunnel RPCs that would
    # inflate t_map by a double-digit percentage
    w_host = np.concatenate([np.ones(half, np.float32), np.zeros(n_frames - half, np.float32)])
    w1 = jax.device_put(w_host)
    w2 = jax.device_put(1.0 - w_host)
    # jitted like the product path (train/gmm_system): one dispatch per
    # class instead of ~15 op-by-op tunnel RPCs; compile outside the
    # timed region like every other bench here. The forcing reduction is
    # ALSO one jitted dispatch.
    map_jit = jax.jit(lambda g, x, fw: map_adapt(g, x, frame_weights=fw))
    force = jax.jit(lambda a, b: jnp.sum(a.means) + jnp.sum(b.means))
    g1 = map_jit(ubm, xd, w1)
    assert np.isfinite(float(force(g1, g1)))  # compile both programs
    t0 = time.time()
    g1 = map_jit(ubm, xd, w1)
    g2 = map_jit(ubm, xd, w2)
    assert np.isfinite(float(force(g1, g2)))
    t_map = time.time() - t0

    print(json.dumps({
        "metric": "ubm_em_fit_seconds",
        "value": round(t_ubm, 2),
        "unit": "s",
        "vs_baseline": round(478.85 / t_ubm, 2),  # speedup over 478.85 s CPU sklearn
        "upload_seconds": round(t_upload, 2),
        "map_adapt_seconds": round(t_map, 2),
        "map_adapt_baseline_seconds": 87.11,
        "map_speedup": round(87.11 / t_map, 1),
        "frames": n_frames, "components": k, "iters": 100,
    }))


if __name__ == "__main__":
    main()
