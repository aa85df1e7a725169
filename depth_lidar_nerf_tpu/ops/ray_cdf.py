"""Per-ray importance CDFs baked into the ray tables (grid training v2).

The first grid-training design replaced the coarse MLP with a trilinear
lookup of a baked 3-D sigma grid — and measured SLOWER than the two-MLP
step: XLA gathers on TPU run ~0.15 elements/cycle, so the 8 corner gathers
at [16384 rays x 64 samples] cost 61 ms against the 43 ms full step
(PERF.md round 4). TPU-native fix: move the randomness-free work to bake
time. Every ray the trainer can draw lives in a device-resident table
(train/tables.py), so the bake evaluates the live fine model's sigma along
EVERY table ray on a fixed z-grid (batched MLP forward — pure MXU, no
gathers) and stores the resulting compositing weights as one extra table
column. The train step then gathers each sampled ray's weight row with the
same contiguous row-gather it already uses for origins/directions and feeds
``sample_pdf`` directly — the per-step "coarse pass" becomes one [N, S]
row gather + inverse-CDF.

Quality semantics: the baked weights are the fine field's own transmittance
weights along the actual ray — a strictly better importance estimate than
the reference's coarse MLP (whose only training signal, img_loss0, exists
to make it approximate exactly this, run_nerf.py:571-600). Staleness is
bounded by the re-bake cadence, and (without ``grid_train_fine_only``) the
fine pass still evaluates the freshly-jittered stratified samples, so
[near, far] coverage never depends on the bake.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class RayCDF(NamedTuple):
    """Baked per-ray importance weights for the two ray tables.

    ``z`` is the shared bake z-grid [S] (near/far are per-config constants,
    train/tables.gather_rays): ``z_mid = 0.5 (z[1:] + z[:-1])`` are the
    ``sample_pdf`` bins.
    """

    w_rgb: jnp.ndarray  # [M_rgb, S] bf16 compositing weights
    w_depth: Optional[jnp.ndarray]  # [M_depth, S] bf16 or None
    z: jnp.ndarray  # [S] f32


def cdf_z_grid(rcfg, S: int) -> jnp.ndarray:
    """Deterministic bake depths: the midpoint z-grid the coarse pass would
    use unperturbed (ops/sampling.stratified_z_vals with perturb=False),
    honoring lindisp."""
    t = jnp.linspace(0.0, 1.0, S, dtype=jnp.float32)
    near, far = jnp.float32(rcfg.near), jnp.float32(rcfg.far)
    if rcfg.lindisp:
        return 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    return near * (1.0 - t) + far * t


@functools.lru_cache(maxsize=16)
def _bake_jit(model, rcfg_key, S: int, chunk: int):
    """One compiled whole-bake program per (model, render-config, S) —
    mirrors ops/density_grid._bake_jit: re-bakes must not re-trace and must
    be one device dispatch."""
    rcfg = rcfg_key

    @jax.jit
    def run(params, origins, directions, viewdirs):
        from depth_lidar_nerf_tpu.render.renderer import (Rays,
                                                          _composite_from_z)

        z = cdf_z_grid(rcfg, S)

        def body(args):
            o, d, v = args
            n = o.shape[0]
            rays = Rays(o, d, v,
                        jnp.full((n, 1), rcfg.near, jnp.float32),
                        jnp.full((n, 1), rcfg.far, jnp.float32))
            zz = jnp.broadcast_to(z, (n, S))
            comp = _composite_from_z(model, params, rays, zz, rcfg, None)
            return comp.weights.astype(jnp.bfloat16)

        n_chunks = origins.shape[0] // chunk
        chunks = jax.tree.map(
            lambda x: x.reshape(n_chunks, chunk, x.shape[-1]),
            (origins, directions, viewdirs))
        return jax.lax.map(body, chunks).reshape(-1, S)

    return run


def bake_table_weights(model, params, rcfg, origins, directions, viewdirs,
                       S: int, chunk: int = 1 << 14) -> jnp.ndarray:
    """Fine-field compositing weights along every table ray: [M, S] bf16.

    The forward rides the same dispatch as an eval render
    (renderer._composite_from_z: fused kernels when supported, Flax
    otherwise) with eval semantics — no jitter, no sigma noise, no cull —
    so the bake is exact coarse-pass math at deterministic depths.
    """
    # Hashable eval-mode config for the jit cache: semantics off (the CDF
    # needs sigma only; skipping the semantic head keeps the bake on the
    # plain rgb kernels) and strict compositing.
    rcfg_b = dataclasses.replace(rcfg.eval_mode(), cull_eps=0.0,
                                 num_semantic_classes=0, render_grid=0,
                                 render_int8=False)
    m = origins.shape[0]
    chunk = min(chunk, m)
    pad = (-m) % chunk
    o, d, v = (jnp.pad(x, ((0, pad), (0, 0))) for x in
               (origins, directions, viewdirs))
    run = _bake_jit(model, rcfg_b, int(S), int(chunk))
    return run(params, o, d, v)[:m]


def bake_ray_cdf(models, params, rcfg, rgb_table, depth_table,
                 S: int) -> RayCDF:
    """Bake both tables' weight columns from the live fine params."""
    fine_model = models.fine if models.fine is not None else models.coarse
    fine_params = params["fine"] if params.get("fine") is not None \
        else params["coarse"]
    w_rgb = bake_table_weights(fine_model, fine_params, rcfg,
                               rgb_table.origins, rgb_table.directions,
                               rgb_table.viewdirs, S)
    w_depth = None
    if depth_table is not None:
        w_depth = bake_table_weights(fine_model, fine_params, rcfg,
                                     depth_table.origins,
                                     depth_table.directions,
                                     depth_table.viewdirs, S)
    return RayCDF(w_rgb, w_depth, cdf_z_grid(rcfg, S))
