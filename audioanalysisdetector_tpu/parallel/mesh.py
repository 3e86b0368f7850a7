"""Device-mesh utilities — the framework's parallelism substrate.

The reference has no distributed backend at all (SURVEY.md §2.6); this
module is where the TPU build makes parallelism first-class. The models here
are small (≤ a few M params), so the right decomposition is pure data
parallelism over ICI: params replicated, batch sharded, ``pmean`` gradients.
The mesh abstraction still exposes extra axes so larger variants can add
model axes without touching call sites.

Multi-host: ``initialize_distributed()`` wires ``jax.distributed`` over DCN
when launched on a pod slice; on a single host it is a no-op.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, *, axis: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_2d(dp: int, mp: int, *, axes: tuple[str, str] = ("data", "model")) -> Mesh:
    """(dp, mp) mesh for experiments that add a model axis."""
    devices = jax.devices()
    if dp * mp > len(devices):
        raise ValueError(f"mesh {dp}x{mp} exceeds {len(devices)} devices")
    grid = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(grid, axes)


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bring-up over DCN.

    With explicit coordinator args (launcher-style bring-up, e.g. the
    2-process localhost test in tests/test_multihost.py) failures propagate;
    with no args, environment auto-detection is attempted and failure means
    single-host operation.
    """
    # do NOT call jax.process_count() here: it would initialize the XLA
    # backend, after which jax.distributed.initialize refuses to run
    from jax._src import distributed as _dist_state

    if getattr(_dist_state.global_state, "client", None) is not None:
        return  # already initialized by the launcher
    explicit = coordinator_address is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        if explicit:
            raise
        # single-host / no coordinator configured


def process_shard(n_items: int) -> slice:
    """This process's contiguous slice of a globally-indexed dataset.

    Multi-host data loading: each host decodes only its shard; the DP mesh
    sees the global batch as process-local arrays stacked by jax. On a
    single process this is the identity slice.
    """
    p, n_p = jax.process_index(), jax.process_count()
    if n_items % n_p:
        # ceil-division would hand processes unequal (possibly empty)
        # slices — jax.make_array_from_process_local_data then assembles a
        # corrupt global batch. Fail with the contract named instead.
        raise ValueError(
            f"global batch of {n_items} rows not divisible by {n_p} processes"
        )
    per = n_items // n_p
    return slice(p * per, (p + 1) * per)


def local_batch_size(global_batch: int, mesh: Mesh, *, axis: str = "data") -> int:
    n = mesh.shape[axis]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} devices")
    return global_batch // n
