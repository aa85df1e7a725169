"""DTU scene loader (images + cameras.npz projection matrices).

Parity: ``load_dtu.py:6-70`` — decompose ``world_mat_i @ scale_mat_i`` into
K/R/t via RQ decomposition, fixed near=0.1 / far=5.0 handled by the caller
(``run_nerf.py:976-977``).
"""

from __future__ import annotations

import os

import numpy as np


def _decompose_projection(P: np.ndarray):
    """P [3, 4] -> K [3, 3], R [3, 3], t [3] with positive-diagonal K."""
    import cv2

    K, R, t, *_ = cv2.decomposeProjectionMatrix(P)
    K = K / K[2, 2]
    t = (t[:3] / t[3])[:, 0]
    return K, R, t


def load_dtu_data(basedir: str):
    """Returns images [N, H, W, 3], c2w poses [N, 4, 4], hwf."""
    from depth_lidar_nerf_tpu.utils.images import imread_rgb_float

    cam = np.load(os.path.join(basedir, "cameras.npz"))
    imgdir = os.path.join(basedir, "image")
    if not os.path.isdir(imgdir):
        imgdir = os.path.join(basedir, "images")
    files = [os.path.join(imgdir, f) for f in sorted(os.listdir(imgdir))
             if f.lower().endswith((".png", ".jpg", ".jpeg"))]
    images = np.stack(
        [imread_rgb_float(f) for f in files]
    ).astype(np.float32)

    poses, focal = [], None
    for i in range(len(files)):
        world_mat = cam[f"world_mat_{i}"]
        scale_mat = cam.get(f"scale_mat_{i}", np.eye(4))
        P = (world_mat @ scale_mat)[:3, :4]
        K, R, t = _decompose_projection(P)
        c2w = np.eye(4)
        c2w[:3, :3] = R.T
        c2w[:3, 3] = t
        # OpenCV camera (+z forward, +y down) -> NeRF camera (-z forward, +y up)
        c2w[:3, 1:3] *= -1
        poses.append(c2w)
        focal = K[0, 0]
    poses = np.stack(poses).astype(np.float32)
    H, W = images.shape[1:3]
    return images, poses, (H, W, float(focal))
