"""Synthetic LLFF-format scene generator.

Creates a tiny on-disk scene (images/, poses_bounds.npy, depth_gt.npy,
segmentation_gt.npy) with an analytic world — colored floating blobs — so the
full CLI pipeline (loaders -> tables -> train -> render -> eval) runs
end-to-end with no external data. Used by the test suite and the benchmark;
the reference has no equivalent (it depends on fern_2v / KITTI downloads).
"""

from __future__ import annotations

import os

import numpy as np


def _look_at(eye, target, up=(0, 1, 0)):
    z = eye - target
    z = z / np.linalg.norm(z)
    x = np.cross(np.asarray(up, np.float64), z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z, eye], axis=1)  # [3, 4] c2w, -z forward


_BLOBS = [  # (center, radius, color)
    (np.array([0.0, 0.0, -4.0]), 1.0, np.array([0.9, 0.2, 0.2])),
    (np.array([1.2, 0.6, -5.0]), 0.8, np.array([0.2, 0.8, 0.3])),
    (np.array([-1.1, -0.5, -3.5]), 0.6, np.array([0.2, 0.3, 0.9])),
]
# Extra occluders for the HARD scene (deterministic; small spheres scattered
# in front of the wall so the depth field has many discontinuities, like the
# parked cars / poles / vegetation of a KITTI-360 street).
_OCCLUDERS = [
    (np.array([-2.1, 0.9, -5.4]), 0.35), (np.array([2.0, -0.8, -4.4]), 0.30),
    (np.array([0.7, -1.1, -3.2]), 0.25), (np.array([-0.6, 1.2, -4.8]), 0.40),
    (np.array([1.7, 1.3, -5.6]), 0.45), (np.array([-1.9, -1.2, -4.9]), 0.38),
    (np.array([0.2, 0.9, -2.9]), 0.22), (np.array([-0.2, -0.4, -5.8]), 0.50),
]
_BG = np.array([0.05, 0.05, 0.08])


def _hard_tex(p):
    """Multi-octave 3-D texture in [0, 1]: enough spectral content that a
    reference-scale NeRF (D=4/W=256, 64+64 samples) plateaus in the
    20-32 dB band instead of memorizing the scene past 40 dB — the failure
    regime real KITTI-360 frames live in (BASELINE.md Table 1: the reference
    full method tops out at 23.46 dB)."""
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    t = (0.50
         + 0.20 * np.sin(3.1 * x) * np.sin(2.3 * y + 0.7)
         + 0.15 * np.sin(9.7 * x + 1.1) * np.sin(7.3 * y) * np.sin(5.1 * z)
         + 0.10 * np.sin(23.0 * x) * np.sin(19.0 * y + 2.0)
         + 0.05 * np.sin(53.0 * x + 0.3) * np.sin(47.0 * y) * np.sin(31.0 * z))
    return np.clip(t, 0.0, 1.0)


def _trace(ro, rd, backdrop=False, hard=False):
    """Analytic sphere tracer: returns rgb [N, 3], depth [N], class [N]."""
    n = ro.shape[0]
    rgb = np.tile(_BG, (n, 1))
    depth = np.full(n, 1e5)
    cls = np.zeros(n, np.int32)  # 0 = background

    def shade(p, col):
        if not hard:
            return np.broadcast_to(col, p.shape).copy()
        m = _hard_tex(p)[:, None]
        return np.clip(col * (0.35 + 0.9 * m), 0.0, 1.0)

    if backdrop or hard:
        # A textured wall at z=-6 behind the blobs: every ray terminates on
        # geometry, the structure of outdoor KITTI-360 frames (road/buildings
        # everywhere, sky stamped with huge depth by the preprocessing).
        t_wall = (-6.0 - ro[:, 2]) / np.where(np.abs(rd[:, 2]) < 1e-9, 1e-9,
                                              rd[:, 2])
        hit_w = t_wall > 0.1
        p = ro + rd * t_wall[:, None]
        if hard:
            tex = _hard_tex(p)
        else:
            tex = 0.5 + 0.25 * np.sin(3.0 * p[:, 0]) * np.sin(2.0 * p[:, 1])
        rgb = np.where(hit_w[:, None],
                       np.stack([tex, tex * 0.8, tex * 0.6], -1), rgb)
        depth = np.where(hit_w, t_wall, depth)

    spheres = [(c, r, col, ci + 1) for ci, (c, r, col) in enumerate(_BLOBS)]
    if hard:
        spheres += [(c, r, _BLOBS[i % len(_BLOBS)][2],
                     (i % len(_BLOBS)) + 1)
                    for i, (c, r) in enumerate(_OCCLUDERS)]
    for c, r, col, label in spheres:
        oc = ro - c
        b = np.sum(oc * rd, -1)
        cc = np.sum(oc * oc, -1) - r * r
        disc = b * b - cc * np.sum(rd * rd, -1)
        hit = disc > 0
        t = (-b - np.sqrt(np.maximum(disc, 0))) / np.sum(rd * rd, -1)
        closer = hit & (t > 0.1) & (t < depth)
        depth = np.where(closer, t, depth)
        p_hit = ro + rd * t[:, None]
        rgb = np.where(closer[:, None], shade(p_hit, col), rgb)
        cls = np.where(closer, label, cls)
    return rgb, depth, cls


def make_scene(
    basedir: str,
    n_images: int = 4,
    H: int = 40,
    W: int = 52,
    focal: float = 50.0,
    n_depth_points: int = 300,
    seed: int = 0,
    backdrop: bool = False,
    num_classes: int | None = None,
    hard: bool = False,
):
    """Write a complete synthetic LLFF scene to ``basedir``.

    ``num_classes`` inflates the DECLARED semantic class count (labels stay
    0..len(_BLOBS)) so benchmarks can match the KITTI-360 19-class head
    shape without a 19-blob world. ``hard=True`` is the non-saturating
    quality scene: multi-octave textures on every surface + 8 extra
    occluders, so reference-scale models plateau in the KITTI-like
    20-32 dB band instead of blowing past 40 dB in minutes."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(basedir, "images"), exist_ok=True)

    poses_rows, images, depth_gts, segs = [], [], [], []
    for vi in range(n_images):
        angle = (vi / max(n_images - 1, 1) - 0.5) * 0.5
        eye = np.array([np.sin(angle) * 1.5, 0.15 * np.sin(vi), np.cos(angle) * 0.4])
        c2w = _look_at(eye, np.array([0.0, 0.0, -4.0]))

        i, j = np.meshgrid(np.arange(W, dtype=np.float64),
                           np.arange(H, dtype=np.float64), indexing="xy")
        dirs = np.stack([(i - W * 0.5) / focal, -(j - H * 0.5) / focal,
                         -np.ones_like(i)], -1)
        rd = np.einsum("hwc,rc->hwr", dirs, c2w[:3, :3]).reshape(-1, 3)
        ro = np.broadcast_to(c2w[:3, 3], rd.shape)

        rgb, depth, cls = _trace(ro, rd, backdrop=backdrop, hard=hard)
        img = rgb.reshape(H, W, 3)
        images.append(img)
        segs.append(cls.reshape(H, W))

        # Sparse "LiDAR" annotations at random pixels with a surface hit.
        hit_mask = depth < 1e4
        hit_idx = np.nonzero(hit_mask)[0]
        pick = rng.choice(hit_idx, size=min(n_depth_points, len(hit_idx)),
                          replace=False)
        coord = np.stack([pick % W, pick // W], axis=-1).astype(np.float64)
        # Reference depth convention: distance along camera -z axis
        # (z-depth), as produced by the KITTI projection chain.
        zdepth = depth[pick] * (-(rd[pick] @ c2w[:3, 2]))
        depth_gts.append({
            "depth": zdepth,
            "coord": coord,
            "weight": np.ones(len(pick)),
        })

        from PIL import Image as PILImage

        PILImage.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(basedir, "images", f"im_{vi:03d}.png"))

        hwf = np.array([[H], [W], [focal]], np.float64)
        poses_rows.append(np.concatenate(
            [np.concatenate([c2w[:, 0:1], -c2w[:, 1:2], -c2w[:, 2:3], c2w[:, 3:]],
                            axis=1), hwf], axis=1))

    near = max(0.5, min(d["depth"].min() for d in depth_gts) * 0.8)
    far = max(d["depth"].max() for d in depth_gts) * 1.2
    poses_bounds = np.stack([
        np.concatenate([p.reshape(-1), [near, far]]) for p in poses_rows
    ])
    np.save(os.path.join(basedir, "poses_bounds.npy"), poses_bounds)
    np.save(os.path.join(basedir, "depth_gt.npy"),
            np.array(depth_gts, dtype=object), allow_pickle=True)
    np.save(os.path.join(basedir, "segmentation_gt.npy"),
            {"segmentations": np.stack(segs),
             "num_classes": max(len(_BLOBS) + 1, num_classes or 0)},
            allow_pickle=True)
    return basedir
