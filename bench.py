"""Benchmark: training-step throughput in rays/sec on the available device.

Runs the full flagship train step (fern_dsnerf scale: netdepth 4 / width 256 /
64 coarse + 64 fine samples, RGB + depth supervision) on a synthetic in-memory
scene and reports ONE JSON line.

Baseline framing (BASELINE.md): the driver's north-star is >= 2M rays/sec on a
TPU v4-8 (4 chips), i.e. 500k rays/sec/chip; the reference PyTorch code runs
N_rand=1024 single-GPU with chunked Python loops. ``vs_baseline`` is measured
rays/sec on this host's chip divided by the 500k/chip target.

Knobs via env: BENCH_N_RAND (default 16384 — large batches keep the MXU fed;
throughput is what's measured, not SGD semantics), BENCH_STEPS (default 30),
BENCH_DTYPE (bfloat16|float32, default bfloat16).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax

    from depth_lidar_nerf_tpu.train.config import TrainConfig, render_config_from
    from depth_lidar_nerf_tpu.train.state import build_models, init_train_state
    from depth_lidar_nerf_tpu.train.step import make_train_step
    from depth_lidar_nerf_tpu.train.tables import build_depth_table, build_rgb_table

    n_rand = int(os.environ.get("BENCH_N_RAND", 16384))
    n_steps = int(os.environ.get("BENCH_STEPS", 30))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    use_fused = os.environ.get("BENCH_FUSED", "1") == "1"

    cfg = TrainConfig(
        N_rand=n_rand, N_samples=64, N_importance=64, netdepth=4, netwidth=256,
        netdepth_fine=4, netwidth_fine=256, use_viewdirs=True, no_ndc=True,
        raw_noise_std=1.0, colmap_depth=True, depth_loss=True,
        depth_lambda=0.01, compute_dtype=dtype, use_fused_mlp=use_fused,
    )
    rcfg = render_config_from(cfg, num_semantic_classes=0, near=2.0, far=6.0)
    models = build_models(cfg, rcfg)
    state = init_train_state(cfg, rcfg, models, jax.random.key(0))

    H, W, focal = 94, 352, 88.0
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (4, H, W, 3)).astype(np.float32)
    poses = np.stack([np.eye(4)[:3].astype(np.float32)] * 4)
    i_train = np.arange(4)
    rgb_t = build_rgb_table(images, poses, i_train, H, W, focal, rcfg)
    depth_gts = [
        dict(depth=rng.uniform(2.5, 5.5, 2000),
             coord=np.stack([rng.uniform(0, W, 2000), rng.uniform(0, H, 2000)], -1),
             weight=np.ones(2000))
        for _ in range(4)
    ]
    dep_t = build_depth_table(depth_gts, poses, i_train, H, W, focal, rcfg)

    step = make_train_step(cfg, rcfg, models, (H, W, focal))

    # Warmup / compile.
    state, m = step(state, rgb_t, dep_t, None, None, jax.random.key(1))
    jax.block_until_ready(m["loss"])

    t0 = time.perf_counter()
    for i in range(n_steps):
        state, m = step(state, rgb_t, dep_t, None, None, jax.random.key(2 + i))
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0

    rays_per_sec = n_rand * n_steps / dt
    print(json.dumps({
        "metric": "train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / 500_000.0, 3),
    }))


if __name__ == "__main__":
    main()
