"""Tracing / profiling subsystem.

The reference's only observability is wall-clock prints around training
phases (reference/ASV_dl_func.py:1139-1149, :1481-1496; SURVEY.md §5). Here
profiling is a real subsystem: per-step timing aggregation with percentile
summaries and throughput, plus ``jax.profiler`` trace capture for
TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field

import jax
import numpy as np


def _fetch_one_element(leaf) -> None:
    """Force execution by fetching O(1) bytes of ``leaf`` to the host.

    Slicing to a single element first (an eager device-side op) keeps the
    forced D2H transfer at one element regardless of output size; fetching
    the whole leaf would bottleneck on the tunnel's ~20-40 MB/s D2H path
    and swamp the timed span for multi-MB outputs.
    """
    if getattr(leaf, "ndim", 0) and getattr(leaf, "size", 1) != 1:
        leaf = leaf.ravel()[:1]
    np.asarray(leaf)


@dataclass
class StepTimer:
    """Accumulates per-step wall times.

    ``measure`` synchronizes on whatever the body registers via
    ``set_result`` before the clock stops; without it, jitted work would be
    timed at async-dispatch cost only. (Note: on remote-tunnel TPU runtimes
    even ``block_until_ready`` may not block — ``profile_fn``'s per-call
    host fetch is the robust pattern there.)
    """

    name: str = "step"
    times: list[float] = field(default_factory=list)

    @contextlib.contextmanager
    def measure(self):
        """Usage: ``with timer.measure() as sync: out = sync(step(...))``.

        ``sync`` blocks on its argument (and returns it), so device work is
        inside the measured span.
        """

        def sync(x):
            # fetch ONE ELEMENT of one leaf — on remote-tunnel TPU runtimes
            # block_until_ready alone returns before the work runs, and
            # fetching a whole leaf would make D2H bandwidth (~20-40 MB/s on
            # the tunnel) dominate the measurement for large outputs
            leaves = jax.tree_util.tree_leaves(x)
            if leaves:
                _fetch_one_element(leaves[0])
            return x

        t0 = time.perf_counter()
        yield sync
        self.times.append(time.perf_counter() - t0)

    def record(self, seconds: float) -> None:
        self.times.append(seconds)

    def summary(self, *, items_per_step: int | None = None, skip_warmup: int = 1) -> dict:
        t = np.asarray(self.times[skip_warmup:] or self.times)
        out = {
            "name": self.name,
            "steps": len(t),
            "mean_ms": float(t.mean() * 1e3),
            "p50_ms": float(np.percentile(t, 50) * 1e3),
            "p99_ms": float(np.percentile(t, 99) * 1e3),
            "total_s": float(t.sum()),
        }
        if items_per_step:
            out["items_per_sec"] = float(items_per_step / t.mean())
        return out

    def dump(self, path: str, **kwargs) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(**kwargs), f, indent=2)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (view in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_fn(fn, *args, iters: int = 10, warmup: int = 2, items: int | None = None) -> dict:
    """Time a device function: compile excluded, execution FORCED by a host
    fetch. ``block_until_ready`` does not actually block on remote-tunnel
    TPU runtimes (CLAUDE.md), so each iteration's output is fetched to the
    host — dispatch-only timing is impossible by construction. The fetch
    round-trip (~tens of ms on tunneled runtimes) is part of each sample;
    for fetch-free steady-state numbers use the chained-accumulator pattern
    the benchmarks use (one fetch for N iterations, see bench.py)."""

    def _force(x):
        # fetch one ELEMENT of one leaf — the only reliable sync on axon,
        # kept O(1) bytes so D2H bandwidth can't dominate the sample
        _fetch_one_element(jax.tree_util.tree_leaves(x)[0])
        return x

    out = None
    for _ in range(max(warmup, 1)):
        out = _force(fn(*args))
    timer = StepTimer(getattr(fn, "__name__", "fn"))
    for _ in range(iters):
        t0 = time.perf_counter()
        _force(fn(*args))
        timer.record(time.perf_counter() - t0)
    return timer.summary(items_per_step=items, skip_warmup=0)


def timed(label: str, verbose: bool = True):
    """Phase-scoped wall timer (the reference's start/end print pattern)."""

    @contextlib.contextmanager
    def ctx():
        t0 = time.time()
        yield
        if verbose:
            print(f"{label}: {time.time() - t0:.2f}s")

    return ctx()
