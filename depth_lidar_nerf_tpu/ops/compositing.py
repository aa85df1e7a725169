"""Alpha compositing of raw MLP outputs into per-ray maps.

Parity target: ``raw2outputs`` (``run_nerf_helpers.py:542-595``), including its
quirks, which are load-bearing for reproducing the reference's results:

- the final sample interval is ``1e10`` (``:558``);
- intervals are scaled by ``|rays_d|`` so z is parametric, not metric (``:560``);
- optional Gaussian noise on sigma before the ReLU (``:563-573``);
- transmittance is an exclusive cumprod of ``1 - alpha + 1e-10`` (``:575``);
- disparity is ``1 / max(1e-10, depth / acc)`` (``:579``);
- semantic logits are summed over samples **unweighted** (``:589``).

Accumulations run in float32 regardless of the MLP compute dtype.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RayOutputs(NamedTuple):
    rgb: jnp.ndarray  # [N, 3]
    disp: jnp.ndarray  # [N]
    acc: jnp.ndarray  # [N]
    weights: jnp.ndarray  # [N, S]
    depth: jnp.ndarray  # [N]
    semantic: jnp.ndarray | None  # [N, C] or None


def raw2outputs(
    raw: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    *,
    raw_noise_std: float = 0.0,
    white_bkgd: bool = False,
    rng: jax.Array | None = None,
    num_semantic_classes: int = 0,
    cull_eps: float = 0.0,
) -> RayOutputs:
    """Composite ``raw [N, S, 4 + C]`` along ``z_vals [N, S]`` into ray maps.

    ``cull_eps > 0`` hard-zeroes the weight of every sample whose incoming
    transmittance is below ``cull_eps`` (a TPU-native addition, no reference
    counterpart): the per-ray output change is bounded by ``cull_eps`` while
    the cotangents of all fully-occluded samples become *exactly* zero — the
    contract the fused kernels' backward-culling relies on to skip those
    samples' FLOPs without changing any gradient.
    """
    raw = raw.astype(jnp.float32)
    z_vals = z_vals.astype(jnp.float32)

    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )  # [N, S]
    dists = dists * jnp.linalg.norm(rays_d[..., None, :].astype(jnp.float32), axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3])  # [N, S, 3]

    sigma = raw[..., 3]
    if raw_noise_std > 0.0:
        if rng is None:
            raise ValueError("raw_noise_std > 0 requires an rng key")
        sigma = sigma + jax.random.normal(rng, sigma.shape, sigma.dtype) * raw_noise_std

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)  # [N, S]
    # Exclusive cumulative transmittance with the reference's 1e-10 floor.
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1),
        axis=-1,
    )[..., :-1]
    weights = alpha * trans
    if cull_eps > 0.0:
        weights = jnp.where(trans >= cull_eps, weights, 0.0)

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)  # [N, 3]
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    semantic = None
    if num_semantic_classes > 0:
        # Reference composites semantic logits UNWEIGHTED over samples
        # (run_nerf_helpers.py:589) — preserved deliberately.
        semantic = jnp.sum(raw[..., 4 : 4 + num_semantic_classes], axis=-2)

    return RayOutputs(rgb_map, disp_map, acc_map, weights, depth_map, semantic)


def composit_dists(z_vals: jnp.ndarray, rays_d: jnp.ndarray) -> jnp.ndarray:
    """The compositor's per-sample distance terms ``dists * |rays_d|`` —
    shared with the fused kernels' in-kernel transmittance tracking so the
    forward cull uses bit-identical alpha math."""
    z_vals = z_vals.astype(jnp.float32)
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], 1e10)],
                            axis=-1)
    return dists * jnp.linalg.norm(rays_d.astype(jnp.float32), axis=-1,
                                   keepdims=True)


def raw2outputs_t(
    raw_t: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    *,
    raw_noise_std: float = 0.0,
    white_bkgd: bool = False,
    rng: jax.Array | None = None,
    cull_eps: float = 0.0,
    noise: jnp.ndarray | None = None,
) -> RayOutputs:
    """Channel-major compositing: ``raw_t [4, N, S]`` (rgb 0:3, sigma 3).

    Mathematically identical to :func:`raw2outputs`; this variant consumes the
    fused kernel's transposed output so no [N*S, small]-lane tensor is ever
    materialized (each [N, S] channel plane has a full-lane layout). Semantic
    heads are not supported on this path (the dispatcher falls back).

    ``noise`` optionally supplies the pre-scaled additive sigma noise (drawn
    by the caller so the forward-culling kernel sees the identical values);
    it must equal ``normal(rng, [N, S]) * raw_noise_std``.
    """
    raw_t = raw_t.astype(jnp.float32)
    z_vals = z_vals.astype(jnp.float32)
    dists = composit_dists(z_vals, rays_d)

    rgb = jax.nn.sigmoid(raw_t[:3])  # [3, N, S]

    sigma = raw_t[3]
    if noise is not None:
        sigma = sigma + noise.astype(jnp.float32)
    elif raw_noise_std > 0.0:
        if rng is None:
            raise ValueError("raw_noise_std > 0 requires an rng key")
        sigma = sigma + jax.random.normal(rng, sigma.shape, sigma.dtype) * raw_noise_std

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10],
                        axis=-1), axis=-1)[..., :-1]
    weights = alpha * trans  # [N, S]
    if cull_eps > 0.0:
        # See raw2outputs: exact-zero cotangents for occluded samples.
        weights = jnp.where(trans >= cull_eps, weights, 0.0)

    rgb_map = jnp.sum(weights[None] * rgb, axis=-1).T  # [N, 3]
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return RayOutputs(rgb_map, disp_map, acc_map, weights, depth_map, None)
