"""One process of the multi-host (DCN) certification run.

Each worker owns 4 virtual CPU devices and ONE row-slice of the global ray
table; ``jax.distributed.initialize`` joins them into an 8-device global
mesh, and the unmodified train step (``make_train_step``) runs on it —
params replicated globally, batch gather against the row-sharded table
(GSPMD inserts the cross-process collectives, Gloo on CPU / DCN on pods).

Launched pairwise by ``tests/test_multihost.py``, which asserts both
processes' metrics match the single-process 8-device run bit-for-tolerance.

Usage: multihost_worker.py <process_id> <num_processes> <port> <out.json>
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DEVICES_PER_PROC = 4


def tiny_setup():
    """Deterministic tiny scene + config shared by workers and the test's
    single-process baseline. Returns (cfg, rcfg, models, state_seed_key_int,
    images, poses, hwf)."""
    import numpy as np

    from depth_lidar_nerf_tpu.train.config import TrainConfig, render_config_from

    cfg = TrainConfig(N_rand=64, N_samples=8, N_importance=8, netdepth=2,
                      netwidth=32, netdepth_fine=2, netwidth_fine=32,
                      use_viewdirs=True, no_ndc=True, multires=4,
                      multires_views=2, use_fused_mlp=False,
                      colmap_depth=True, depth_loss=True)
    rcfg = render_config_from(cfg, 0, near=2.0, far=6.0)
    H, W, focal = 16, 16, 14.0
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (2, H, W, 3)).astype(np.float32)
    poses = np.stack([np.eye(4)[:3].astype(np.float32)] * 2)
    depth_gts = [
        dict(depth=rng.uniform(2.5, 5.5, 32),
             coord=np.stack([rng.uniform(0, W, 32),
                             rng.uniform(0, H, 32)], -1),
             weight=np.ones(32))
        for _ in range(2)
    ]
    return cfg, rcfg, images, poses, depth_gts, (H, W, focal)


def run_steps(mesh, n_steps=2):
    """Build tables/state on the given (possibly multi-process) mesh and run
    the unmodified train step; returns the per-step scalar metrics."""
    import numpy as np

    import jax

    from depth_lidar_nerf_tpu.parallel.distributed import (
        global_key, global_replicated, pad_rows, process_row_slice,
        shard_table_rows)
    from depth_lidar_nerf_tpu.train.state import build_models, init_train_state
    from depth_lidar_nerf_tpu.train.step import make_train_step
    from depth_lidar_nerf_tpu.train.tables import (build_depth_table,
                                                   build_rgb_table)

    cfg, rcfg, images, poses, depth_gts, hwf = tiny_setup()
    H, W, focal = hwf
    models = build_models(cfg, rcfg)
    state = init_train_state(cfg, rcfg, models, jax.random.key(0))

    i_train = np.array([0, 1])
    rgb_t = build_rgb_table(images, poses, i_train, H, W, focal, rcfg)
    dep_t = build_depth_table(depth_gts, poses, i_train, H, W, focal, rcfg)
    # host-side numpy for slicing (the tables come back as jnp arrays)
    rgb_t = jax.tree.map(lambda x: None if x is None else np.asarray(x), rgb_t)
    dep_t = jax.tree.map(lambda x: None if x is None else np.asarray(x), dep_t)

    n_dev = mesh.devices.size
    rgb_t, rgb_rows = pad_rows(rgb_t, n_dev)
    dep_t, dep_rows = pad_rows(dep_t, n_dev)

    def to_global(table, rows):
        lo, hi = process_row_slice(rows)
        local = jax.tree.map(lambda x: None if x is None else x[lo:hi], table)
        return shard_table_rows(mesh, local, rows)

    with mesh:
        rgb_g = to_global(rgb_t, rgb_rows)
        dep_g = to_global(dep_t, dep_rows)
        state_g = global_replicated(mesh, state)
        step = make_train_step(cfg, rcfg, models, hwf, mesh=mesh)
        out = []
        for i in range(n_steps):
            key = global_key(mesh, 1000 + i)
            state_g, metrics = step(state_g, rgb_g, dep_g, None, None, key)
            out.append({k: float(np.mean(jax.device_get(v)))
                        for k, v in metrics.items()})
    return out


def main():
    pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", DEVICES_PER_PROC)

    from depth_lidar_nerf_tpu.parallel.distributed import init_distributed
    init_distributed(f"localhost:{port}", num_processes=nproc, process_id=pid)

    import numpy as np
    from depth_lidar_nerf_tpu.parallel.mesh import make_mesh
    devices = jax.devices()  # global across processes
    assert len(devices) == nproc * DEVICES_PER_PROC
    assert len(jax.local_devices()) == DEVICES_PER_PROC
    mesh = make_mesh([len(devices)], devices)

    metrics = run_steps(mesh)
    with open(out_path, "w") as f:
        json.dump({"process_id": pid, "num_processes": nproc,
                   "global_devices": len(devices),
                   "local_devices": len(jax.local_devices()),
                   "metrics": metrics}, f)
    print(f"[multihost-worker {pid}] ok:", metrics[-1], flush=True)


if __name__ == "__main__":
    main()
