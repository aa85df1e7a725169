"""Device-resident ray tables.

The reference precomputes every training ray on host, shuffles, and streams
batches through a torch DataLoader every step (``run_nerf.py:1126-1206``).
TPU-native replacement: the (small) ray tables live in HBM once, and each
jitted step gathers a uniform random batch by index with ``jax.random`` —
zero per-step host->device traffic and no input pipeline on the hot path.

Rays are stored post-NDC with their unit pre-NDC viewdirs, so the step is
pure gather + render + loss.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

import jax.numpy as jnp

from depth_lidar_nerf_tpu.ops.rays import camera_rays, ndc_rays, rays_by_coord
from depth_lidar_nerf_tpu.render.renderer import RenderConfig, Rays


class RgbRayTable(NamedTuple):
    origins: jnp.ndarray  # [M, 3]
    directions: jnp.ndarray  # [M, 3]
    viewdirs: jnp.ndarray  # [M, 3]
    rgb: jnp.ndarray  # [M, 3]
    semantic: Optional[jnp.ndarray]  # [M] int32 or None


class DepthRayTable(NamedTuple):
    origins: jnp.ndarray
    directions: jnp.ndarray
    viewdirs: jnp.ndarray
    depth: jnp.ndarray  # [M]
    weight: jnp.ndarray  # [M]


def _finalize(rays_o, rays_d, cfg: RenderConfig, H, W, focal):
    rays_o = rays_o.reshape(-1, 3).astype(np.float32)
    rays_d = rays_d.reshape(-1, 3).astype(np.float32)
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    if cfg.ndc:
        o, d = ndc_rays(H, W, focal, 1.0, jnp.asarray(rays_o), jnp.asarray(rays_d))
        rays_o, rays_d = np.asarray(o), np.asarray(d)
    return rays_o, rays_d, viewdirs.astype(np.float32)


def build_rgb_table(
    images: np.ndarray,  # [N, H, W, 3]
    poses: np.ndarray,  # [N, 3, 4]
    i_train: np.ndarray,
    H: int,
    W: int,
    focal: float,
    cfg: RenderConfig,
    segmentation: Optional[np.ndarray] = None,  # [N, H, W] int
) -> RgbRayTable:
    all_o, all_d, all_v, all_rgb, all_sem = [], [], [], [], []
    for i in i_train:
        ro, rd = camera_rays(H, W, focal, jnp.asarray(poses[i]))
        o, d, v = _finalize(np.asarray(ro), np.asarray(rd), cfg, H, W, focal)
        all_o.append(o)
        all_d.append(d)
        all_v.append(v)
        all_rgb.append(images[i].reshape(-1, 3).astype(np.float32))
        if segmentation is not None:
            all_sem.append(segmentation[i].reshape(-1).astype(np.int32))
    sem = jnp.asarray(np.concatenate(all_sem)) if segmentation is not None else None
    return RgbRayTable(
        jnp.asarray(np.concatenate(all_o)),
        jnp.asarray(np.concatenate(all_d)),
        jnp.asarray(np.concatenate(all_v)),
        jnp.asarray(np.concatenate(all_rgb)),
        sem,
    )


def build_depth_table(
    depth_gts,  # list of {depth, coord, weight} per image (load_lidar_depth)
    poses: np.ndarray,
    i_train: np.ndarray,
    H: int,
    W: int,
    focal: float,
    cfg: RenderConfig,
) -> DepthRayTable:
    """Depth-supervised rays through the LiDAR/COLMAP pixel coords
    (run_nerf.py:1167-1187)."""
    all_o, all_d, all_v, all_z, all_w = [], [], [], [], []
    for i in i_train:
        coords = np.asarray(depth_gts[i]["coord"], np.float32)
        ro, rd = rays_by_coord(H, W, focal, jnp.asarray(poses[i]), jnp.asarray(coords))
        o, d, v = _finalize(np.asarray(ro), np.asarray(rd), cfg, H, W, focal)
        all_o.append(o)
        all_d.append(d)
        all_v.append(v)
        all_z.append(np.asarray(depth_gts[i]["depth"], np.float32).reshape(-1))
        all_w.append(np.asarray(depth_gts[i]["weight"], np.float32).reshape(-1))
    return DepthRayTable(
        jnp.asarray(np.concatenate(all_o)),
        jnp.asarray(np.concatenate(all_d)),
        jnp.asarray(np.concatenate(all_v)),
        jnp.asarray(np.concatenate(all_z)),
        jnp.asarray(np.concatenate(all_w)),
    )


def gather_rays(table, idx, cfg: RenderConfig) -> Rays:
    """Index a table into a renderer Rays batch."""
    near = jnp.full((idx.shape[0], 1), cfg.near, jnp.float32)
    far = jnp.full((idx.shape[0], 1), cfg.far, jnp.float32)
    viewdirs = table.viewdirs[idx] if cfg.use_viewdirs else None
    return Rays(table.origins[idx], table.directions[idx], viewdirs, near, far)
