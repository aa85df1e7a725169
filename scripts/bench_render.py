"""Render benchmark: full-image fps at 400x400 (BASELINE.md metric #3).

Renders the flagship model (netdepth 4 / width 256 / 64+64 samples) repeatedly
at 400x400 and reports fps + rays/sec. Honest timing: iterations are chained
through a running checksum and closed with a host value fetch (the tunnel's
block_until_ready returns early — see PERF.md).
"""

from __future__ import annotations

import json
import os
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from depth_lidar_nerf_tpu.render import render_image
    from depth_lidar_nerf_tpu.train.config import TrainConfig, render_config_from
    from depth_lidar_nerf_tpu.train.state import build_models, init_train_state

    H = W = int(os.environ.get("BENCH_RES", 400))
    n = int(os.environ.get("BENCH_FRAMES", 5))
    int8 = os.environ.get("BENCH_INT8", "0") == "1"
    cfg = TrainConfig(N_samples=64, N_importance=64, netdepth=4, netwidth=256,
                      netdepth_fine=4, netwidth_fine=256, use_viewdirs=True,
                      no_ndc=True, compute_dtype="bfloat16")
    rcfg = render_config_from(cfg, 0, 2.0, 6.0)
    if int8:  # BENCH_INT8=1: the quantized W8A8 serving forward
        import dataclasses

        rcfg = dataclasses.replace(rcfg, render_int8=True)
    nf_only = os.environ.get("BENCH_FINE_ONLY", "0") == "1"
    if nf_only:  # BENCH_FINE_ONLY=1: no-grid fine-only serving
        import dataclasses

        rcfg = dataclasses.replace(rcfg, render_fine_only=True)
    coarse_ds = int(os.environ.get("BENCH_COARSE_DS", 0))
    if coarse_ds:  # BENCH_COARSE_DS=k: k x k-block downsampled placement
        import dataclasses

        rcfg = dataclasses.replace(rcfg, render_coarse_downsample=coarse_ds)
    grid_res = int(os.environ.get("BENCH_GRID", 0))
    fine_only = os.environ.get("BENCH_GRID_FINE", "0") == "1"
    models = build_models(cfg, rcfg)
    state = init_train_state(cfg, rcfg, models, jax.random.key(0))

    params = state.params
    if grid_res:  # BENCH_GRID=R: baked-density-grid coarse pass
        import dataclasses

        from depth_lidar_nerf_tpu.ops.density_grid import (bake_density_grid,
                                                           frustum_bounds)
        from depth_lidar_nerf_tpu.ops.rays import camera_rays

        rcfg = dataclasses.replace(rcfg, render_grid=grid_res,
                                   render_grid_fine_only=fine_only)
        ro, rd = camera_rays(H, W, 0.9 * W, jnp.eye(4)[:3])
        lo, hi = frustum_bounds(ro[:: H - 1, :: W - 1], rd[:: H - 1, :: W - 1],
                                rcfg.near, rcfg.far)
        params = dict(params)
        params["density_grid"] = bake_density_grid(
            models.fine, state.params["fine"], rcfg, lo, hi, grid_res)

    @jax.jit
    def frame(p, c2w):
        img = render_image(models.coarse, models.fine, p, H, W, 0.9 * W, c2w,
                           rcfg, tile=32768)["rgb_map"]
        # Chain the next pose through this frame INSIDE the jit: frames can't
        # be elided, and no eager op ever round-trips the tunnel mid-loop
        # (eager chaining measured 1.8 fps for a 6.3 fps render — the old
        # number was tunnel latency, not render time).
        return img, c2w.at[0, 3].add(img[0, 0, 0] * 1e-8)

    c2w = jnp.eye(4)[:3]
    img, c2w = frame(params, c2w)
    _ = float(img[0, 0, 0])  # warm + honest barrier

    t0 = time.perf_counter()
    for i in range(n):
        img, c2w = frame(params, c2w)
    _ = float(img[0, 0, 0])
    dt = (time.perf_counter() - t0) / n

    print(json.dumps({
        "metric": (f"render_fps_{H}x{W}" + ("_int8" if int8 else "")
                   + ("_fineonly" if nf_only else "")
                   + (f"_coarseds{coarse_ds}" if coarse_ds else "")
                   + (f"_grid{grid_res}" if grid_res else "")
                   + ("_gridfineonly" if grid_res and fine_only else "")),
        "value": round(1.0 / dt, 3),
        "unit": "fps",
        "rays_per_sec": round(H * W / dt, 1),
    }))


if __name__ == "__main__":
    main()
