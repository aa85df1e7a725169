"""Measure the serving paths on a TRAINED model: speed + quality A/B.

Trains the flagship-shape model (netdepth 4 / width 256 / 64+64 samples,
bf16) on the deterministic synthetic scene for a short run, then renders the
held-out view through the serving configurations — bf16, int8 (W8A8
kernels), fine-only (coarse MLP places the samples, fine pass evaluates only
those — no grid, no gathers), fine-only+int8, baked-density-grid coarse
pass, grid+int8, grid-fine-only ×2 — and reports one JSON line: per-frame
times, PSNR of each render against the ground truth, and PSNR against the
bf16 render (the serving-path noise floor).

    python scripts/int8_eval.py            # ~2k iters train + A/B render

Env: INT8_EVAL_ITERS (default 2000), INT8_EVAL_FRAMES (default 5 timed
frames per leg), INT8_EVAL_GRID (bake resolution, default 192; 0 skips the
grid legs). Extra argv entries pass through as trainer flag overrides.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from depth_lidar_nerf_tpu.data.synthetic import make_scene
    from depth_lidar_nerf_tpu.evaluation.metrics import psnr as psnr_np
    from depth_lidar_nerf_tpu.render import render_image
    from depth_lidar_nerf_tpu.train.config import parse_args, render_config_from
    from depth_lidar_nerf_tpu.train.loop import train
    from depth_lidar_nerf_tpu.train.state import build_models

    iters = int(os.environ.get("INT8_EVAL_ITERS", 2000))
    frames = int(os.environ.get("INT8_EVAL_FRAMES", 5))

    scene_dir = os.path.join(ROOT, "runs", "flagship_scene")
    if not os.path.exists(os.path.join(scene_dir, "poses_bounds.npy")):
        make_scene(scene_dir, n_images=20, H=94, W=352, focal=88.0,
                   n_depth_points=8000, seed=1, backdrop=True)
    os.chdir(ROOT)
    cfg = parse_args([
        "--config", "configs/flagship_synthetic.txt",
        "--expname", "int8_eval",
        "--N_iters", str(iters), "--i_print", "500",
        "--i_weights", str(iters), "--i_testset", "0", "--i_img", "0",
        "--i_video", "0",
        # base losses only: this probe measures RENDER quality/speed, not
        # the perceptual stack
        "--feature_loss", "False", "--gan_loss", "False",
        "--depth_inverse_loss", "False", "--semantic_loss", "False",
    ] + sys.argv[1:])  # extra overrides (e.g. a tiny netwidth for CPU runs)
    state = train(cfg)

    from depth_lidar_nerf_tpu.train.loop import load_scene

    scene = load_scene(cfg)
    H, W, focal = scene.hwf
    test_i = int(scene.i_test[0])
    pose = jnp.asarray(scene.poses[test_i])
    gt = np.asarray(scene.images[test_i])
    rcfg = render_config_from(cfg, scene.num_semantic_classes,
                              scene.near, scene.far)
    models = build_models(cfg, rcfg)

    def leg(rc, params):
        out = render_image(models.coarse, models.fine, params,
                           H, W, focal, pose, rc)
        rgb = np.asarray(out["rgb_map"])
        _ = float(rgb[0, 0, 0])
        t0 = time.perf_counter()
        for _i in range(frames):
            out = render_image(models.coarse, models.fine, params,
                               H, W, focal, pose, rc)
            jax.block_until_ready(out["rgb_map"])
        dt = (time.perf_counter() - t0) / frames
        return rgb, dt

    legs = {"bf16": (rcfg, state.params),
            "int8": (dataclasses.replace(rcfg, render_int8=True),
                     state.params),
            # Fine-only WITHOUT a grid: coarse MLP places the samples, the
            # fine pass evaluates only those N_importance — no gathers.
            "fine_only": (dataclasses.replace(rcfg, render_fine_only=True),
                          state.params),
            "fine_only_int8": (dataclasses.replace(
                rcfg, render_fine_only=True, render_int8=True),
                state.params),
            # k x k-block downsampled coarse placement (full-res fine pass);
            # k must divide H and W (here 94x352 -> k=2 only).
            "coarse_ds2": (dataclasses.replace(
                rcfg, render_coarse_downsample=2), state.params)}

    grid_res = int(os.environ.get("INT8_EVAL_GRID", 192))
    if grid_res:
        from depth_lidar_nerf_tpu.train.loop import _bake_render_grid

        gp, grc = _bake_render_grid(
            cfg.replace(render_grid=grid_res), rcfg, models, state.params,
            scene.poses[scene.i_test[:1]], scene.hwf)
        legs["grid"] = (grc, gp)
        legs["grid_int8"] = (dataclasses.replace(grc, render_int8=True), gp)
        # Fine-only: N_importance MLP evals per ray total (PERF.md — quality
        # depends on field convergence; 40+ dB vs full on a converged model)
        fast = dataclasses.replace(grc, render_grid_fine_only=True,
                                   render_grid_samples=128)
        legs["grid_fine_only"] = (fast, gp)
        legs["grid_fine_only_int8"] = (
            dataclasses.replace(fast, render_int8=True), gp)

    result = {"metric": "serving_render_ab", "iters": iters,
              "grid_res": grid_res}
    rgb_bf = None
    for tag, (rc, params) in legs.items():
        rgb, dt = leg(rc, params)
        if rgb_bf is None:
            rgb_bf = rgb
        result[f"frame_ms_{tag}"] = round(dt * 1e3, 2)
        result[f"psnr_{tag}_vs_gt"] = round(float(psnr_np(rgb, gt)), 2)
        if tag != "bf16":
            result[f"psnr_{tag}_vs_bf16"] = round(
                float(psnr_np(rgb, rgb_bf)), 2)
            result[f"speedup_{tag}"] = round(
                result["frame_ms_bf16"] / result[f"frame_ms_{tag}"], 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
