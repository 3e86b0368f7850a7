"""Test configuration: CPU backend with 8 virtual devices.

Multi-chip sharding tests run against a simulated 8-device CPU mesh — the
standard JAX substitute for real TPU pods (the reference has no distributed
tests at all; see SURVEY.md §4). Must run before the first ``import jax``.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the real TPU
# tunnel (which also ignores the env var), so set the config flag directly.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: test time is dominated by CPU XLA compiles,
# which are identical across runs (cache is keyed by HLO hash — safe)
jax.config.update("jax_compilation_cache_dir", "/tmp/aad_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# Parity mode: float32 matmuls at full precision so golden comparisons
# against float64 numpy references are meaningful.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running (multi-process / full-recipe) tests")
