"""Isolate the grid-train step's cost anatomy on the live chip.

Times, in one process on an otherwise-idle host: the two-MLP step, the
grid-mode step, the bare bake, and the bare trilinear lookup at step shape —
so a grid-mode slowdown can be attributed (gather cost vs dispatch vs
fallback). Writes one JSON line.

Env: PGS_N_RAND (16384), PGS_STEPS (30), PGS_RES (128), PGS_FINE_DEPTH (4),
PGS_SEMANTIC (0), PGS_FINE_ONLY (0), PGS_GRID_SAMPLES (0).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax
    import jax.numpy as jnp

    from depth_lidar_nerf_tpu.data.synthetic import make_scene
    from depth_lidar_nerf_tpu.ops.density_grid import trilinear_sigma
    from depth_lidar_nerf_tpu.ops.ray_cdf import bake_ray_cdf
    from depth_lidar_nerf_tpu.train.config import TrainConfig, render_config_from
    from depth_lidar_nerf_tpu.train.loop import (bake_grid,
                                                 grid_bounds_for_poses,
                                                 load_scene)
    from depth_lidar_nerf_tpu.train.state import build_models, init_train_state
    from depth_lidar_nerf_tpu.train.step import make_train_step
    from depth_lidar_nerf_tpu.train.tables import build_depth_table, build_rgb_table

    n_rand = int(os.environ.get("PGS_N_RAND", 16384))
    n_steps = int(os.environ.get("PGS_STEPS", 30))
    res = int(os.environ.get("PGS_RES", 128))
    fine_depth = int(os.environ.get("PGS_FINE_DEPTH", 4))
    semantic = os.environ.get("PGS_SEMANTIC", "0") == "1"
    fine_only = os.environ.get("PGS_FINE_ONLY", "0") == "1"
    gsamples = int(os.environ.get("PGS_GRID_SAMPLES", 0))

    out = {"n_rand": n_rand, "res": res, "fine_depth": fine_depth,
           "semantic": semantic, "fine_only": fine_only}
    with tempfile.TemporaryDirectory() as d:
        make_scene(d, n_images=4, H=94, W=352, focal=88.0,
                   n_depth_points=8000, backdrop=True,
                   num_classes=19 if semantic else None)
        cfg = TrainConfig(
            datadir=d, dataset_type="llff", factor=0, llffhold=0,
            test_scene=[-1], N_rand=n_rand, N_samples=64, N_importance=64,
            netdepth=4, netwidth=256, netdepth_fine=fine_depth,
            netwidth_fine=256, use_viewdirs=True, no_ndc=True,
            raw_noise_std=1.0, colmap_depth=True, depth_loss=True,
            depth_lambda=0.01, semantic_loss=semantic, semantic_lambda=0.04,
            compute_dtype="bfloat16", grid_train=True, grid_train_res=res,
            grid_train_fine_only=fine_only, grid_train_samples=gsamples,
        )
        scene = load_scene(cfg)
        H, W, focal = scene.hwf
        rcfg = render_config_from(cfg, scene.num_semantic_classes if semantic
                                  else 0, scene.near, scene.far)
        models = build_models(cfg, rcfg)
        state = init_train_state(cfg, rcfg, models, jax.random.key(0))
        rgb_t = build_rgb_table(scene.images, scene.poses, scene.i_train,
                                H, W, focal, rcfg,
                                scene.segmentation if semantic else None)
        dep_t = build_depth_table(scene.depth_gts, scene.poses, scene.i_train,
                                  H, W, focal, rcfg)

        def timeit(fn, n=n_steps):
            fn()  # compile + warm
            t0 = time.perf_counter()
            for _ in range(n):
                fn()
            jax.block_until_ready(sink[-1])
            return (time.perf_counter() - t0) / n

        sink = [jnp.zeros(())]

        # two-MLP steady state
        base = make_train_step(cfg, rcfg, models, scene.hwf)
        st = state
        for i in range(200):
            st, m = base(st, rgb_t, dep_t, None, None, jax.random.key(2 + i))
        _ = float(m["psnr"])
        t0 = time.perf_counter()
        for i in range(n_steps):
            st, m = base(st, rgb_t, dep_t, None, None, jax.random.key(9000 + i))
        _ = float(m["loss"])
        out["two_mlp_ms"] = round((time.perf_counter() - t0) / n_steps * 1e3, 2)

        # bake: per-ray CDF tables (the training path) and the 3-D grid
        # (eval serving), timed separately
        s_cdf = gsamples or 64
        cdf = bake_ray_cdf(models, st.params, rcfg, rgb_t, dep_t, s_cdf)
        t0 = time.perf_counter()
        for _ in range(5):
            cdf = bake_ray_cdf(models, st.params, rcfg, rgb_t, dep_t, s_cdf)
        jax.block_until_ready(cdf.w_rgb)
        out["bake_cdf_ms"] = round((time.perf_counter() - t0) / 5 * 1e3, 2)
        lo, hi = grid_bounds_for_poses(rcfg, scene.poses, scene.hwf)
        grid3 = bake_grid(rcfg, models, st.params, lo, hi, res, verbose=False)
        t0 = time.perf_counter()
        for _ in range(5):
            grid3 = bake_grid(rcfg, models, st.params, lo, hi, res,
                              verbose=False)
        jax.block_until_ready(grid3[0])
        out["bake_grid_ms"] = round((time.perf_counter() - t0) / 5 * 1e3, 2)

        # bare trilinear lookup at step shape [n_rand, 64]
        pts = jax.random.uniform(jax.random.key(5), (n_rand, 64, 3),
                                 minval=lo, maxval=hi)

        @jax.jit
        def lookup(g, p):
            return trilinear_sigma(g[0], g[1], g[2], p).sum()

        v = lookup(grid3, pts)
        _ = float(v)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            v = lookup(grid3, pts)
        _ = float(v)
        out["lookup_ms"] = round((time.perf_counter() - t0) / n_steps * 1e3, 2)

        # grid step (ray-CDF coarse pass)
        gstep = make_train_step(cfg, rcfg, models, scene.hwf, grid_mode=True)
        st2 = st
        st2, m = gstep(st2, rgb_t, dep_t, None, None, jax.random.key(1), cdf)
        _ = float(m["loss"])
        t0 = time.perf_counter()
        for i in range(n_steps):
            st2, m = gstep(st2, rgb_t, dep_t, None, None,
                           jax.random.key(20_000 + i), cdf)
        _ = float(m["loss"])
        out["grid_ms"] = round((time.perf_counter() - t0) / n_steps * 1e3, 2)

        out["two_mlp_rays_s"] = round(n_rand / out["two_mlp_ms"] * 1e3)
        out["grid_rays_s"] = round(n_rand / out["grid_ms"] * 1e3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
