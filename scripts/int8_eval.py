"""Measure the int8 (W8A8) serving path on a TRAINED model: speed + quality.

Trains the flagship-shape model (netdepth 4 / width 256 / 64+64 samples,
bf16) on the deterministic synthetic scene for a short run, then renders the
held-out view with the bf16 kernels and the quantized serving kernels and
reports one JSON line: per-frame times, PSNR of each render against the
ground truth, and PSNR of int8 against bf16 (the quantization noise floor).

    python scripts/int8_eval.py            # ~2k iters train + A/B render

Env: INT8_EVAL_ITERS (default 2000), INT8_EVAL_FRAMES (default 5 timed
frames per leg).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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

    def leg(rc, tag):
        out = render_image(models.coarse, models.fine, state.params,
                           H, W, focal, pose, rc)
        rgb = np.asarray(out["rgb_map"])
        _ = float(rgb[0, 0, 0])
        t0 = time.perf_counter()
        for _i in range(frames):
            out = render_image(models.coarse, models.fine, state.params,
                               H, W, focal, pose, rc)
            jax.block_until_ready(out["rgb_map"])
        dt = (time.perf_counter() - t0) / frames
        return rgb, dt

    rgb_bf, dt_bf = leg(rcfg, "bf16")
    rgb_q8, dt_q8 = leg(dataclasses.replace(rcfg, render_int8=True), "int8")

    print(json.dumps({
        "metric": "int8_render_ab",
        "iters": iters,
        "frame_ms_bf16": round(dt_bf * 1e3, 2),
        "frame_ms_int8": round(dt_q8 * 1e3, 2),
        "speedup": round(dt_bf / dt_q8, 3),
        "psnr_bf16_vs_gt": round(float(psnr_np(rgb_bf, gt)), 2),
        "psnr_int8_vs_gt": round(float(psnr_np(rgb_q8, gt)), 2),
        "psnr_int8_vs_bf16": round(float(psnr_np(rgb_q8, rgb_bf)), 2),
    }))


if __name__ == "__main__":
    main()
