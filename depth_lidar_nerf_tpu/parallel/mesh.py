"""Device-mesh construction and ray-axis sharding constraints.

Parallelism model (SURVEY.md §2.5): NeRF training is embarrassingly parallel
over rays —

- the ray batch (and every per-ray intermediate: samples, MLP activations,
  composited maps) is sharded over the ``rays`` mesh axis;
- parameters (~1-2 MB) are replicated on every chip;
- the loss is a mean over rays, so its gradient is an all-reduce that GSPMD
  lowers to a ``psum`` over ICI.

Rather than hand-writing shard_map collectives, the train step inserts
``with_sharding_constraint`` on the gathered ray batch and lets the XLA SPMD
partitioner propagate the sharding through render + backward. On a v4-8 this
puts the two MLP pipelines fully data-parallel with one gradient
reduce-scatter/all-gather pair per step.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def make_mesh(shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """1-D ray-DP mesh over all (or the given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is not None:
        n = 1
        for s in shape:
            n *= s
        devices = devices[:n]
    import numpy as np

    return Mesh(np.array(devices), (RAY_AXIS,))


def ray_sharder(mesh: Optional[Mesh]):
    """Returns fn(pytree) constraining dim-0 of every array to the ray axis."""
    if mesh is None:
        return lambda tree: tree
    sharding = NamedSharding(mesh, P(RAY_AXIS))

    def constrain(tree):
        def one(x):
            if x is None or x.ndim == 0:
                return x
            s = NamedSharding(mesh, P(RAY_AXIS, *([None] * (x.ndim - 1))))
            return jax.lax.with_sharding_constraint(x, s)

        return jax.tree.map(one, tree)

    return constrain


def replicate(mesh: Mesh, tree):
    """Place a pytree fully replicated on the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)
