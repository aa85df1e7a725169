"""Multi-host (multi-process) data parallelism over DCN.

The reference is single-process/single-GPU (SURVEY §2.5: no
torch.distributed anywhere); this module is the TPU-native scaling axis
beyond one host: ``jax.distributed.initialize`` + a global device mesh
spanning processes, with

- **ray tables sharded per process**: each host holds only its row slice of
  the (potentially huge) precomputed ray tables; the slices are stitched
  into one global row-sharded ``jax.Array`` (``shard_table_rows``). The
  train step's in-jit gather-by-index then runs against the global table —
  GSPMD inserts the cross-host collective for the O(batch)-sized rows that
  cross process boundaries (table stays put; only gathered rays move over
  DCN/ICI).
- **params/opt-state replicated globally** (``global_replicated``): the
  model is ~1-2 MB, so every process holds a full copy and the gradient
  psum rides ICI within hosts and DCN across.

Single-process meshes degrade gracefully: the same helpers lower to plain
``device_put`` with the equivalent shardings, so every code path here is
exercised by the single-host test suite too; the 2-process × 4-device CPU
certification lives in ``tests/test_multihost.py`` (subprocess-driven, Gloo
collectives).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from depth_lidar_nerf_tpu.parallel.mesh import RAY_AXIS


def init_distributed(coordinator_address: Optional[str],
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids: Optional[Sequence[int]] = None) -> None:
    """Join the JAX distributed runtime. MUST run before any other JAX call
    (backend creation pins the process topology). On TPU pods the three
    arguments are normally auto-detected and ``initialize()`` with no
    arguments suffices; the explicit form serves CPU/GPU clusters and the
    multi-process CPU certification test."""
    kwargs = {}
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)


def process_row_slice(global_rows: int, shard_rows: bool = True):
    """This process's [lo, hi) row range of a ``global_rows``-row table.

    Rows are split contiguously and equally over processes (the remainder
    goes to the last process... no: tables are padded to divisibility by
    :func:`pad_rows` first, so every process gets exactly
    ``global_rows // process_count`` rows). With ``shard_rows=False`` (or a
    single process) the full range is returned.
    """
    n = jax.process_count()
    if n == 1 or not shard_rows:
        return 0, global_rows
    assert global_rows % n == 0, (
        f"pad the table first: {global_rows} rows over {n} processes")
    per = global_rows // n
    pid = jax.process_index()
    return pid * per, (pid + 1) * per


def pad_rows(table, multiple: int):
    """Pad every leaf's dim-0 up to a multiple by repeating row 0.

    Uniform-with-replacement batch sampling makes duplicate rows
    statistically harmless (they change per-row sampling probability by
    O(pad/rows)); this keeps process/device row counts exactly divisible.
    """
    leaves = [x for x in jax.tree_util.tree_leaves(table) if x is not None]
    rows = leaves[0].shape[0]
    pad = (-rows) % multiple
    if pad == 0:
        return table, rows

    def one(x):
        if x is None:
            return None
        reps = np.broadcast_to(x[:1], (pad,) + x.shape[1:])
        return np.concatenate([np.asarray(x), reps], axis=0)

    return jax.tree.map(one, table), rows + pad


def shard_table_rows(mesh: Mesh, local_table, global_rows: Optional[int] = None):
    """Build a globally row-sharded table from this process's row slice.

    ``local_table``: the pytree holding ONLY this process's rows (all
    processes together cover the global table in process order).
    Single-process: pass the full table; plain ``device_put`` applies the
    row sharding and XLA slices rows across local devices.
    """
    def spec(x):
        return P(RAY_AXIS, *([None] * (x.ndim - 1)))

    if jax.process_count() == 1:
        return jax.tree.map(
            lambda x: None if x is None
            else jax.device_put(x, NamedSharding(mesh, spec(x))), local_table)

    def one(x):
        if x is None:
            return None
        x = np.asarray(x)
        gshape = (global_rows,) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec(x)), x, global_shape=gshape)

    return jax.tree.map(one, local_table)


def global_replicated(mesh: Mesh, tree):
    """Fully replicate a host-equal pytree onto a (possibly multi-process)
    mesh. Every process must pass the same values (e.g. params initialized
    from a shared seed). Single-process: plain replicated device_put."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def one(x):
        if x is None:
            return x
        if np.ndim(x) == 0 and not hasattr(x, "dtype"):
            return x  # python scalars stay host-side
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx])

    return jax.tree.map(one, tree)


def global_key(mesh: Mesh, seed: int):
    """A PRNG key replicated across a multi-process mesh (keys are opaque
    typed arrays, so they go through key_data -> global array -> wrap)."""
    data = jax.random.key_data(jax.random.key(seed))
    gdata = global_replicated(mesh, np.asarray(data))
    return jax.random.wrap_key_data(gdata)
