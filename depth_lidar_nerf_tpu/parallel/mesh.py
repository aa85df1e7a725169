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

A second, optional ``model`` mesh axis adds tensor parallelism for the Flax
MLP path (``mesh_shape=[dp, tp]``): every Dense kernel/bias whose output
dimension divides ``tp`` is sharded column-parallel over the axis
(Megatron-style ``P(None, 'model')``), activations become 2-D sharded
``('rays', 'model')``, and GSPMD inserts the per-layer collectives over ICI.
The reference has no analogue (single-GPU torch); this is the scaling path
for models too wide for one chip's VMEM/HBM. The fused Pallas kernels are
per-device and therefore ray-DP only — ``tp > 1`` requires the Flax path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"
MODEL_AXIS = "model"


def make_mesh(shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Ray-DP mesh; a 2-entry shape ``[dp, tp]`` adds the ``model`` axis."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    if shape is not None and len(shape) == 2:
        dp, tp = shape
        if dp * tp > len(devices):
            raise ValueError(
                f"mesh_shape {list(shape)} needs {dp * tp} devices, "
                f"have {len(devices)}")
        grid = np.array(devices[: dp * tp]).reshape(dp, tp)
        return Mesh(grid, (RAY_AXIS, MODEL_AXIS))
    if shape is not None:
        n = 1
        for s in shape:
            n *= s
        devices = devices[:n]
    return Mesh(np.array(devices), (RAY_AXIS,))


def model_parallel_size(mesh: Optional[Mesh]) -> int:
    """tp degree of the mesh (1 when absent or 1-D)."""
    if mesh is None:
        return 1
    return dict(mesh.shape).get(MODEL_AXIS, 1)


def ray_sharder(mesh: Optional[Mesh]):
    """Returns fn(pytree) constraining dim-0 of every array to the ray axis."""
    if mesh is None:
        return lambda tree: tree

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


def _tp_spec(x, tp: int) -> P:
    """Column-parallel placement rule shared by :func:`shard_params` (device
    placement) and :func:`param_constrainer` (in-jit constraint) — one copy,
    so the two layouts cannot drift: any 1-D/2-D array whose LAST dim is
    divisible by ``tp`` and at least ``4 * tp`` wide shards
    ``P(..., 'model')``; tiny heads (out <= C) and scalars stay
    replicated."""
    if (hasattr(x, "ndim") and x.ndim in (1, 2)
            and x.shape[-1] % tp == 0 and x.shape[-1] >= 4 * tp):
        return P(*([None] * (x.ndim - 1)), MODEL_AXIS)
    return P()


def shard_params(mesh: Mesh, tree):
    """Place a state/param pytree with model-TP sharding on a 2-D mesh.

    The :func:`_tp_spec` rule catches every trunk/feature/views Dense kernel
    and bias (plus their Adam mu/nu mirrors, which have identical shapes).
    On a 1-D mesh this degrades to :func:`replicate`.
    """
    tp = model_parallel_size(mesh)
    if tp <= 1:
        return replicate(mesh, tree)
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, _tp_spec(x, tp))),
        tree)


def param_constrainer(mesh: Optional[Mesh]):
    """In-jit ``with_sharding_constraint`` twin of :func:`shard_params`.

    Pins updated params/opt-state to the same column-parallel layout inside
    the train step; without it GSPMD is free to pick a different sharding for
    the updated tree (e.g. row-sharding a tiny head kernel), which would make
    the output state's layout drift from the input rule and trigger one
    re-specialization on the next call. No-op for 1-D/absent meshes.
    """
    tp = model_parallel_size(mesh)
    if tp <= 1:
        return lambda tree: tree

    def constrain(tree):
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, _tp_spec(x, tp)))
            if hasattr(x, "ndim") else x, tree)

    return constrain
