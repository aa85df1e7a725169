"""Checkpoint save/auto-resume.

Role of the reference's ``.tar`` checkpoints + latest-file discovery
(``run_nerf.py:449-477, 1872-1883``): the full train state — NeRF params,
optimizer state, step counter, discriminator params/optimizer — is saved
every ``i_weights`` iters and the newest checkpoint in the experiment dir is
restored on startup. Implemented with orbax (async-capable, TPU-friendly
sharded arrays) instead of torch.save.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from depth_lidar_nerf_tpu.train.state import TrainState


def _ckpt_dir(basedir: str, expname: str) -> str:
    return os.path.abspath(os.path.join(basedir, expname, "checkpoints"))


def make_manager(basedir: str, expname: str, max_to_keep: int = 5):
    path = _ckpt_dir(basedir, expname)
    os.makedirs(path, exist_ok=True)
    opts = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep)
    if jax.process_count() > 1:
        # Multi-host: checkpointing is process-0-only (params are fully
        # replicated; the loop saves a host-local snapshot). Restricting the
        # manager's active processes keeps its internal barriers off the
        # other hosts — a save on process 0 must not block on processes
        # that never call save.
        opts = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            create=False,  # orbax forbids create=True with active_processes;
            # the root dir is made above
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=0, active_processes={0}))
    return ocp.CheckpointManager(path, options=opts)

def save_state(mgr, state: TrainState, step: int) -> None:
    mgr.save(step, args=ocp.args.StandardSave(state))


def restore_latest(mgr, template: TrainState) -> Optional[TrainState]:
    """Restore the newest checkpoint, or None (fresh start / --no_reload)."""
    step = mgr.latest_step()
    if step is None:
        return None
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    return mgr.restore(step, args=ocp.args.StandardRestore(abstract))


def restore_from_path(path: str, template: TrainState) -> TrainState:
    """Restore a *specific* checkpoint (``--ft_path``, run_nerf.py:449-450).

    Accepts either a CheckpointManager step dir (``.../checkpoints/<step>``)
    or the item dir inside it (containing ``default``).
    """
    path = os.path.abspath(path)
    if os.path.isdir(os.path.join(path, "default")):
        path = os.path.join(path, "default")
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(path, abstract)
