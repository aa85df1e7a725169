"""Reproduce the flagship-config quality run (PERF.md, round 2).

Generates the deterministic synthetic scene (20 views, 94x352 — the
KITTI-360 factor-4 frame shape of configs/fern_dsnerf.txt — with a textured
backdrop so every ray terminates on geometry, 8000 LiDAR-style sparse depth
points per view) and launches the full kitti360_full.txt loss stack at FULL
patch size: RGB + LiDAR depth + inverse-depth smoothness + VGG19 feature
(94x352 full-image patches every 10th iter) + semantic CE, 20k iterations.

    python scripts/flagship_quality.py            # scene + 20k-iter train
    python scripts/flagship_quality.py --scene    # scene only

Held-out metrics land in the [TEST] log lines every 2500 iters; the measured
curve (PSNR 35.6 -> 41.5 over 20k) is recorded in PERF.md.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    from depth_lidar_nerf_tpu.data.synthetic import make_scene

    hard = "--hard" in sys.argv  # non-saturating scene (PERF.md round 4)
    scene = os.path.join(ROOT, "runs",
                         "flagship_scene_hard" if hard else "flagship_scene")
    if not os.path.exists(os.path.join(scene, "poses_bounds.npy")):
        make_scene(scene, n_images=20, H=94, W=352, focal=88.0,
                   n_depth_points=8000, seed=1, backdrop=True, hard=hard)
        print(f"scene written to {scene}")
    if "--scene" in sys.argv:
        return

    from depth_lidar_nerf_tpu.train.config import parse_args
    from depth_lidar_nerf_tpu.train.loop import train

    os.chdir(ROOT)
    extra = [a for a in sys.argv[1:] if a != "--hard"]
    cfg = parse_args(["--config", "configs/flagship_synthetic.txt",
                      "--datadir", scene,
                      *(["--expname", "flagship_hard"] if hard else []),
                      *extra])
    train(cfg)


if __name__ == "__main__":
    main()
