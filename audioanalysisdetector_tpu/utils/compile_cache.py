"""Persistent XLA compilation cache setup.

On the target runtime a cold TPU compile of even a small program costs tens
of seconds (the compile service sits behind the same tunnel as the chip;
measured: the 10-iteration Lloyd program alone took 34-137 s cold vs 0.03 s
warm). The cache is keyed by HLO hash, so reuse across processes is safe.
Benchmarks and the CLI call this so one-time compiles don't pollute
measured phases; tests configure the same directory in ``conftest.py``.
"""

from __future__ import annotations

CACHE_DIR = "/tmp/aad_tpu_jax_cache"


def enable_compile_cache(cache_dir: str = CACHE_DIR) -> None:
    """Enable the persistent compilation cache (idempotent; call early)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
