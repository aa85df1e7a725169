"""Baked density grid: a serving-time replacement for the coarse MLP pass.

TPU-native serving accelerator with no reference counterpart (the reference
always runs the coarse MLP at render time, ``run_nerf.py:582-609``). After
training, the fine model's raw sigma field is evaluated once on a regular
``R^3`` grid over the rendered frustum; eval renders then place their fine
samples from a trilinear lookup of that grid instead of a 64-sample coarse
MLP pass — deleting ~1/3 of the render FLOPs (coarse S=64 of the total
64 + 128 MLP evaluations per ray) for a bake that costs one forward over
``R^3`` points. The FINE pass — the image you see — still runs the full MLP;
only the *sample placement* comes from the grid, so the quality impact is a
slightly different importance distribution, not a baked appearance.

The grid stores RAW (pre-ReLU, pre-noise) sigma so the renderer's composite
math (``ops/compositing.py``) applies unchanged. Lookup is 8 flat gathers +
trilinear weights — bandwidth-trivial next to an MLP pass.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def frustum_bounds(rays_o, rays_d, near: float, far: float,
                   margin: float = 0.05):
    """Axis-aligned bounds of the sampled volume: min/max of ``o + d * z``
    over z in {near, far} for every given ray, padded by ``margin`` of the
    extent on each side. Host-side numpy (bake-time only)."""
    o = np.asarray(rays_o, np.float64).reshape(-1, 3)
    d = np.asarray(rays_d, np.float64).reshape(-1, 3)
    pts = np.concatenate([o + d * near, o + d * far], axis=0)
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    pad = (hi - lo) * margin + 1e-6
    return (lo - pad).astype(np.float32), (hi + pad).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _bake_jit(model, multires: int, multires_views: int, R: int, chunk: int):
    """One compiled whole-bake program per (model, encode, R) — the bake
    runs every ``grid_rebake_every`` training steps, so it must not re-trace
    (a fresh ``@jax.jit`` closure per call measured 7-15s/bake over the axon
    tunnel vs ~0.1s compiled) and must be ONE device dispatch (eager
    per-chunk dispatches each pay tunnel RTT)."""
    from depth_lidar_nerf_tpu.ops.embedding import positional_encoding

    dtype = getattr(model, "dtype", None) or jnp.float32
    n = R * R * R
    n_chunks = -(-n // chunk)

    @jax.jit
    def run(p, lo, hi):
        axes = [jnp.linspace(lo[i], hi[i], R, dtype=jnp.float32)
                for i in range(3)]
        pts = jnp.stack(jnp.meshgrid(*axes, indexing="ij"),
                        axis=-1).reshape(-1, 3)
        pts = jnp.pad(pts, ((0, n_chunks * chunk - n), (0, 0)))

        def body(x):
            pe = positional_encoding(x, multires).astype(dtype)
            ve = jnp.zeros((x.shape[0], 3 + 6 * multires_views), dtype)
            raw = model.apply(p, pe, ve)
            return raw[..., 3].astype(jnp.float32)

        sigma = jax.lax.map(body, pts.reshape(n_chunks, chunk, 3))
        return sigma.reshape(-1)[:n].reshape(R, R, R)

    return run


def bake_density_grid(model, params, cfg, lo, hi, resolution: int,
                      chunk: int = 1 << 18):
    """Evaluate the model's raw sigma on an ``R^3`` grid over [lo, hi].

    ``model`` is the Flax-module wrapper (train.state model types all expose
    ``.apply(params, pts_embed, views_embed)``); the view branch gets a zero
    embedding — sigma is computed before the view conditioning
    (run_nerf_helpers.py:153-158), so its value is exact. Returns
    ``(grid [R, R, R] f32, lo [3] f32, hi [3] f32)`` ready to attach to the
    render params as ``params["density_grid"]``. Compiled once per
    (model, R); re-bakes are a single device dispatch.
    """
    R = int(resolution)
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)
    run = _bake_jit(model, int(cfg.multires), int(cfg.multires_views), R,
                    min(int(chunk), R * R * R))
    return run(params, lo, hi), lo, hi


def trilinear_sigma(grid, lo, hi, pts):
    """Trilinear interpolation of ``grid [R, R, R]`` at world points
    ``pts [..., 3]``; out-of-bounds points clamp to the boundary voxels."""
    R = grid.shape[0]
    u = (pts - lo) / (hi - lo) * (R - 1)  # [..., 3] voxel coords
    i0 = jnp.clip(jnp.floor(u), 0, R - 2).astype(jnp.int32)
    f = jnp.clip(u - i0, 0.0, 1.0)

    flat = grid.reshape(-1)
    base = (i0[..., 0] * R + i0[..., 1]) * R + i0[..., 2]

    def corner(dx, dy, dz):
        return jnp.take(flat, base + (dx * R + dy) * R + dz, axis=0)

    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    c00 = corner(0, 0, 0) * (1 - fz) + corner(0, 0, 1) * fz
    c01 = corner(0, 1, 0) * (1 - fz) + corner(0, 1, 1) * fz
    c10 = corner(1, 0, 0) * (1 - fz) + corner(1, 0, 1) * fz
    c11 = corner(1, 1, 0) * (1 - fz) + corner(1, 1, 1) * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx
