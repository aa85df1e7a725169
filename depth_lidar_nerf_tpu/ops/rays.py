"""Ray generation: pinhole camera rays, per-coordinate rays, NDC warp, patches.

Camera convention follows the reference's (modified-LLFF) pinhole model
(``run_nerf_helpers.py:266-318``): image-plane direction
``[(i - W/2)/f, -(j - H/2)/f, -1]`` rotated by ``c2w[:3, :3]``, origin at
``c2w[:3, 3]``. The NDC warp is the standard forward-facing projection with the
near plane at ``near`` (``run_nerf_helpers.py:320-337``).

All functions are shape-polymorphic jnp code usable on host (via numpy inputs)
or inside jit; the train step generates rays on device from gathered
(pose, pixel) pairs instead of precomputing and shuffling every ray on host as
the reference does (``run_nerf.py:1126-1154``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def camera_rays(H: int, W: int, focal, c2w):
    """Full-image pinhole rays.

    Returns ``rays_o, rays_d`` of shape ``[H, W, 3]``.
    Parity: ``get_rays`` / ``get_rays_np`` (``run_nerf_helpers.py:266-300``).
    """
    i, j = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32), jnp.arange(H, dtype=jnp.float32), indexing="xy"
    )
    dirs = jnp.stack(
        [(i - W * 0.5) / focal, -(j - H * 0.5) / focal, -jnp.ones_like(i)], axis=-1
    )
    rays_d = jnp.einsum("...c,rc->...r", dirs, c2w[:3, :3], precision=jax.lax.Precision.HIGHEST)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def rays_by_coord(H: int, W: int, focal, c2w, coords):
    """Rays through specific pixel coordinates ``coords[..., 2]`` = (u, v).

    ``coords[..., 0]`` is the x/column coordinate, ``coords[..., 1]`` the
    y/row coordinate — the layout the LiDAR depth tables use.
    Parity: ``get_rays_by_coord_np`` (``run_nerf_helpers.py:303-318``).
    """
    u = (coords[..., 0] - W * 0.5) / focal
    v = -(coords[..., 1] - H * 0.5) / focal
    dirs = jnp.stack([u, v, -jnp.ones_like(u)], axis=-1)
    rays_d = jnp.einsum("...c,rc->...r", dirs, c2w[:3, :3], precision=jax.lax.Precision.HIGHEST)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(H: int, W: int, focal, near, rays_o, rays_d):
    """Warp rays to normalized device coordinates (forward-facing scenes).

    Parity: ``ndc_rays`` (``run_nerf_helpers.py:320-337``).
    """
    # Shift origins to the near plane.
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox, oy, oz = rays_o[..., 0], rays_o[..., 1], rays_o[..., 2]
    dx, dy, dz = rays_d[..., 0], rays_d[..., 1], rays_d[..., 2]

    o0 = -1.0 / (W / (2.0 * focal)) * ox / oz
    o1 = -1.0 / (H / (2.0 * focal)) * oy / oz
    o2 = 1.0 + 2.0 * near / oz

    d0 = -1.0 / (W / (2.0 * focal)) * (dx / dz - ox / oz)
    d1 = -1.0 / (H / (2.0 * focal)) * (dy / dz - oy / oz)
    d2 = -2.0 * near / oz

    return jnp.stack([o0, o1, o2], axis=-1), jnp.stack([d0, d1, d2], axis=-1)


def patch_ray_dirs(H: int, W: int, focal, c2w, start_h, start_w, nH: int, nW: int):
    """Rays for a contiguous ``nH x nW`` pixel crop starting at (start_h, start_w).

    Returns ``rays_o, rays_d`` of shape ``[nH, nW, 3]`` in row-major patch
    order. This replaces the reference's host-side crop + random permutation
    split (``get_rays_cropped_feature_loss_new``, ``run_nerf_helpers.py:430-494``):
    here the whole patch is generated in scan-line order on device and the
    grad/no-grad split is a permutation index handled by the caller.

    ``start_h``/``start_w`` may be traced scalars so crop selection does not
    recompile the step.
    """
    jj, ii = jnp.meshgrid(
        jnp.arange(nH, dtype=jnp.float32), jnp.arange(nW, dtype=jnp.float32), indexing="ij"
    )
    i = ii + start_w  # column / x
    j = jj + start_h  # row / y
    dirs = jnp.stack(
        [(i - W * 0.5) / focal, -(j - H * 0.5) / focal, -jnp.ones_like(i)], axis=-1
    )
    rays_d = jnp.einsum("...c,rc->...r", dirs, c2w[:3, :3], precision=jax.lax.Precision.HIGHEST)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d
