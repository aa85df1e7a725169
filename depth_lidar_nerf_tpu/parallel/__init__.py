"""Multi-chip parallelism: device meshes and sharded train steps.

The reference is strictly single-GPU (SURVEY.md §2.5 — no torch.distributed
anywhere). This package is the rebuild's first-class replacement: data
parallelism over the ray axis on a ``jax.sharding.Mesh``, parameters
replicated, gradient reduction as XLA ``psum`` over ICI — no NCCL analogue
needed, the compiler emits the collectives.
"""

from depth_lidar_nerf_tpu.parallel.mesh import (
    make_mesh, model_parallel_size, ray_sharder, replicate, shard_params)

__all__ = ["make_mesh", "model_parallel_size", "ray_sharder", "replicate",
           "shard_params"]
