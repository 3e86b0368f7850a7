"""Parallelism substrate: meshes, data parallelism, model-axis sharding."""

from audioanalysisdetector_tpu.parallel.mesh import (
    initialize_distributed,
    local_batch_size,
    make_mesh,
    make_mesh_2d,
)
from audioanalysisdetector_tpu.parallel.sharded_gmm import (
    make_mesh_2d_for,
    make_sharded_masked_llr,
    shard_components,
)

__all__ = [
    "initialize_distributed",
    "local_batch_size",
    "make_mesh",
    "make_mesh_2d",
    "make_mesh_2d_for",
    "make_sharded_masked_llr",
    "shard_components",
]
