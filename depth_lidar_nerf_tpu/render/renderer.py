"""The volumetric renderer: one fused XLA computation per ray batch.

This replaces the reference's render stack (``render`` -> ``batchify_rays`` ->
``render_rays`` -> ``run_network`` -> ``batchify``, ``run_nerf.py:50-194,
520-675``) with a single pure function. There are no chunk/netchunk Python
loops: the full coarse pass, inverse-CDF fine resampling, fine pass and
compositing lower to one XLA program, so the MXU sees two large
``[N_rays * N_samples, W]`` matmul pipelines per step. Image-sized batches are
tiled with ``lax.map`` in :func:`render_image` purely to bound HBM, not as a
scheduling mechanism.

Ray parametrization parity (``run_nerf.py:112-194``): rays carry origin,
direction, near, far and (optionally) the *unnormalized pre-NDC* view
direction, normalized here exactly as the reference normalizes before the NDC
warp.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from depth_lidar_nerf_tpu.ops.compositing import raw2outputs
from depth_lidar_nerf_tpu.ops.embedding import positional_encoding
from depth_lidar_nerf_tpu.ops.rays import camera_rays, ndc_rays, rays_by_coord
from depth_lidar_nerf_tpu.ops.sampling import sample_pdf, stratified_z_vals


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rendering hyperparameters (config_parser flags, run_nerf.py:693-747)."""

    N_samples: int = 64
    N_importance: int = 64
    perturb: bool = True
    lindisp: bool = False
    raw_noise_std: float = 0.0
    white_bkgd: bool = False
    use_viewdirs: bool = True
    multires: int = 10
    multires_views: int = 4
    num_semantic_classes: int = 0
    ndc: bool = True
    near: float = 0.0
    far: float = 1.0
    use_pallas_sampling: bool = False  # fused Pallas inverse-CDF kernel (TPU)
    # Memory knobs (run_nerf.py:77-89 ``--chunk``/``--netchunk``): ``chunk``
    # bounds rays per compiled render tile. ``netchunk`` (points per MLP
    # apply) has no separate loop to control in the fused design — the tile
    # is capped so rays*samples stays within it when the user lowers it.
    chunk: int = 1024 * 32
    netchunk: int = 1024 * 64
    # Transmittance cull threshold (TPU-native, no reference counterpart):
    # samples with incoming transmittance < cull_eps contribute exactly zero
    # weight, making their cotangents exactly zero so the fused kernels'
    # backward skips their FLOPs. 0.0 = strict reference semantics.
    cull_eps: float = 0.0
    # Quantized (W8A8 int8-MXU) serving forward for pure render calls,
    # incl. semantic renders (quantized trunk + bf16 affine head). TPU-native,
    # no reference counterpart. The train loop only sets this on the
    # RenderConfig it hands to eval renders — the int8 kernels have no VJP
    # and must never sit inside a loss.
    render_int8: bool = False
    # Baked-density-grid serving (ops/density_grid.py): when > 0 AND the
    # render params carry a baked ``density_grid`` entry, the coarse MLP pass
    # is replaced by a trilinear sigma lookup at this grid resolution — the
    # fine pass (the visible image) still runs the full MLP. Serving-only;
    # the value is the bake resolution R and doubles as the on/off switch.
    render_grid: int = 0
    # Grid fine-only mode: the fine MLP evaluates ONLY the N_importance
    # samples the grid CDF placed (instead of coarse + importance), cutting
    # the render's MLP evals to N_importance per ray. Requires render_grid.
    render_grid_fine_only: bool = False
    # Stratified sample count for the grid CDF (0 = N_samples). Grid lookups
    # are bandwidth-trivial, so a finer CDF costs ~nothing and sharpens the
    # importance placement — useful with render_grid_fine_only.
    render_grid_samples: int = 0
    # Fine-only serving WITHOUT a grid: the coarse MLP still runs (it places
    # the importance samples) but the fine pass evaluates ONLY the
    # N_importance CDF-placed samples instead of the stratified+importance
    # union — per-ray MLP evals drop from N_samples + (N_samples +
    # N_importance) to N_samples + N_importance, with zero gathers (the 3-D
    # grid's trilinear lookup measured SLOWER than the coarse MLP it
    # replaces on TPU — PERF.md round 4). Eval/serving only; the train loop
    # never sets this on the training config.
    render_fine_only: bool = False
    # Serving accelerator on top of fine-only: the coarse placement pass
    # runs at (H/k, W/k) — one ray per k x k pixel block — and its
    # inverse-CDF fine-sample depths are shared across the block; the
    # visible fine pass stays full-res. render_image-only (needs the 2-D
    # pixel layout). 0/1 = off.
    render_coarse_downsample: int = 0

    def render_tile(self, fused: bool = False) -> int:
        """Ray-tile size for :func:`render_rays_tiled` honoring both knobs.

        ``netchunk`` exists to bound the [points, W] activations the
        reference's torch MLP materializes per apply (run_nerf.py:50-74).
        The fused kernels stream activations through VMEM in fixed
        <=8192-point tiles and never put them in HBM, so when every pass of
        the render takes a fused path (``fused=True``, see
        :func:`fused_eval_ready`) a lowered netchunk is vacuously satisfied
        and only ``chunk`` (rays per compiled tile) binds. The reference's
        own shipped configs set netchunk=16384 (fern_dsnerf.txt:14) as a
        GPU-memory workaround; honoring it as a literal ray cap on the
        fused path would mean 128-ray tiles — 243 sequential dispatches for
        one 94x352 patch render (measured: the no-grad patch render
        dominated patch iterations, PERF.md round 3)."""
        s_total = max(1, self.N_samples + self.N_importance)
        by_points = max(128, self.netchunk // s_total)
        if not fused and self.netchunk < 1024 * 64:
            return max(128, min(self.chunk, by_points))
        return max(128, self.chunk)

    def eval_mode(self) -> "RenderConfig":
        """Test-time variant: no jitter, no sigma noise (run_nerf.py:502-504)."""
        return dataclasses.replace(self, perturb=False, raw_noise_std=0.0)


class Rays(NamedTuple):
    origins: jnp.ndarray  # [N, 3] (possibly NDC-warped)
    directions: jnp.ndarray  # [N, 3] (possibly NDC-warped)
    viewdirs: Optional[jnp.ndarray]  # [N, 3] unit, pre-NDC; None w/o viewdirs
    near: jnp.ndarray  # [N, 1]
    far: jnp.ndarray  # [N, 1]


def make_rays(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    cfg: RenderConfig,
    H: int | None = None,
    W: int | None = None,
    focal=None,
) -> Rays:
    """Package world-space rays: viewdirs from pre-NDC directions, NDC warp.

    Parity: ray-batch assembly in ``render`` (``run_nerf.py:145-183``).
    """
    rays_o = rays_o.reshape(-1, 3).astype(jnp.float32)
    rays_d = rays_d.reshape(-1, 3).astype(jnp.float32)
    viewdirs = None
    if cfg.use_viewdirs:
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    if cfg.ndc:
        if H is None or W is None or focal is None:
            raise ValueError("ndc=True requires H, W and focal in make_rays()")
        rays_o, rays_d = ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
    near = jnp.full_like(rays_d[..., :1], cfg.near)
    far = jnp.full_like(rays_d[..., :1], cfg.far)
    return Rays(rays_o, rays_d, viewdirs, near, far)


def query_network(model, params, pts, viewdirs, cfg: RenderConfig,
                  frozen_sigma=None):
    """Encode and evaluate the field at ``pts [N, S, 3]``.

    Fuses the reference's ``run_network`` embed + chunked apply
    (``run_nerf.py:60-74``) into the surrounding computation. Encoding math
    runs in float32 (the high octave bands need the mantissa) but the
    materialized embedding is stored in the model's compute dtype — with
    bfloat16 models this halves the largest intermediate HBM tensors of the
    step.
    """
    if (frozen_sigma is None and hasattr(model, "supports_raw")
            and pts.ndim == 3 and pts.shape[-2] > 0
            and (1024 % pts.shape[-2]) == 0 and viewdirs is not None
            and model.supports_raw(params, cfg)
            and (not hasattr(model, "rays_ok")
                 or model.rays_ok(pts.shape[0]))):
        return model.apply_raw(params, pts, viewdirs, cfg)
    dtype = getattr(model, "dtype", None) or jnp.float32
    pts_embed = positional_encoding(pts, cfg.multires).astype(dtype)
    views_embed = None
    if cfg.use_viewdirs:
        ve = positional_encoding(viewdirs, cfg.multires_views)  # [N, Ev]
        views_embed = jnp.broadcast_to(
            ve[..., None, :], pts.shape[:-1] + ve.shape[-1:]).astype(dtype)
    return model.apply(params, pts_embed, views_embed, frozen_sigma=frozen_sigma)


def _composite_from_z(model, params, rays: Rays, z_vals, cfg: RenderConfig,
                      noise_rng, fwd_sort_key=None, save_acts=False):
    """Evaluate the field at per-ray depths and composite.

    Prefers the transposed fused path (channel-major raw [4, N, S]; no
    [P, small]-lane tensor ever exists in HBM) with the channel-major
    compositor; falls back to the Flax module + standard compositing.

    ``fwd_sort_key`` (per-ray estimated termination depth) enables the fused
    kernel's exact early-terminating forward when ``cull_eps > 0``: the sigma
    noise is drawn here once so the in-kernel transmittance tracking and the
    compositor add identical values.
    """
    from depth_lidar_nerf_tpu.ops.compositing import (composit_dists,
                                                      raw2outputs_t)
    from depth_lidar_nerf_tpu.ops.fused_mlp_t import supports_rays_shape

    S = z_vals.shape[-1]
    # The int8 serving path saves no activations, so only the topology
    # predicate gates it (n_points=0 skips the acts-HBM byte cap).
    int8_sem = (cfg.render_int8 and hasattr(model, "apply_rays_semantic_q8"))
    if (cfg.num_semantic_classes > 0
            and hasattr(model, "apply_rays_semantic")
            and rays.viewdirs is not None and supports_rays_shape(S)
            and model.supports_raw_semantic(
                params, cfg,
                n_points=0 if int8_sem else z_vals.shape[0] * S, S=S)
            and (not hasattr(model, "rays_ok")
                 or model.rays_ok(z_vals.shape[0]))):
        # Semantic fast path: kernel raw + IN-KERNEL semantic head
        # (run_nerf_helpers.py:109) already composited as the reference's
        # UNWEIGHTED sum over samples (:589) — sem_map is [N, C] f32.
        if int8_sem:
            raw_t, sem_map = model.apply_rays_semantic_q8(
                params, rays, z_vals, cfg)
        else:
            raw_t, sem_map = model.apply_rays_semantic(
                params, rays, z_vals, cfg)
        noise = None
        if cfg.raw_noise_std > 0.0 and noise_rng is not None:
            noise = jax.random.normal(
                noise_rng, z_vals.shape, jnp.float32) * cfg.raw_noise_std
        out = raw2outputs_t(
            raw_t, z_vals, rays.directions,
            raw_noise_std=cfg.raw_noise_std, white_bkgd=cfg.white_bkgd,
            rng=noise_rng, cull_eps=cfg.cull_eps, noise=noise)
        return out._replace(semantic=sem_map)
    if (cfg.render_int8 and cfg.num_semantic_classes == 0
            and hasattr(model, "apply_rays_q8") and rays.viewdirs is not None
            and supports_rays_shape(S)
            and model.supports_rays_path(params, cfg)
            and (not hasattr(model, "rays_ok")
                 or model.rays_ok(z_vals.shape[0]))):
        # Quantized serving path: same topology coverage as apply_rays; the
        # semantic stack falls through to the bf16 kernels (no int8 head).
        raw_t = model.apply_rays_q8(params, rays, z_vals, cfg)
        return raw2outputs_t(
            raw_t, z_vals, rays.directions,
            raw_noise_std=cfg.raw_noise_std, white_bkgd=cfg.white_bkgd,
            rng=noise_rng, cull_eps=cfg.cull_eps)
    if (hasattr(model, "apply_rays") and rays.viewdirs is not None
            and supports_rays_shape(S)
            # supports_rays_path (v4) also covers the reference-default
            # netdepth=8/skip@4 topology; supports_raw is the v3 predicate.
            and getattr(model, "supports_rays_path",
                        model.supports_raw)(params, cfg)
            and (not hasattr(model, "rays_ok")
                 or model.rays_ok(z_vals.shape[0]))):
        noise = None
        if cfg.raw_noise_std > 0.0 and noise_rng is not None:
            noise = jax.random.normal(
                noise_rng, z_vals.shape, jnp.float32) * cfg.raw_noise_std
        fwd_cull = None
        if fwd_sort_key is not None and cfg.cull_eps > 0.0:
            deltas = composit_dists(z_vals, rays.directions)
            fwd_cull = (jax.lax.stop_gradient(fwd_sort_key), deltas,
                        noise if noise is not None
                        else jnp.zeros_like(z_vals, dtype=jnp.float32),
                        cfg.cull_eps)
        raw_t = model.apply_rays(params, rays, z_vals, cfg,
                                 fwd_cull=fwd_cull, save_acts=save_acts)
        return raw2outputs_t(
            raw_t, z_vals, rays.directions,
            raw_noise_std=cfg.raw_noise_std, white_bkgd=cfg.white_bkgd,
            rng=noise_rng, cull_eps=cfg.cull_eps, noise=noise)
    pts = (rays.origins[..., None, :]
           + rays.directions[..., None, :] * z_vals[..., :, None])
    raw = query_network(model, params, pts, rays.viewdirs, cfg)
    return raw2outputs(
        raw, z_vals, rays.directions,
        raw_noise_std=cfg.raw_noise_std, white_bkgd=cfg.white_bkgd,
        rng=noise_rng, num_semantic_classes=cfg.num_semantic_classes,
        cull_eps=cfg.cull_eps)


def _composite_from_grid(grid3, rays: Rays, z_vals, cfg: RenderConfig):
    """Serving coarse pass from a baked sigma grid (ops/density_grid.py).

    Trilinear raw-sigma lookup at the coarse sample points, composited with
    the standard math so the resulting ``weights`` drive ``sample_pdf``
    exactly like an MLP coarse pass would. The coarse RGB is a constant
    black (sigmoid(-20) ~ 0) — the fine pass renders the visible image.
    No noise: the grid path is eval-only.
    """
    from depth_lidar_nerf_tpu.ops.compositing import raw2outputs_t
    from depth_lidar_nerf_tpu.ops.density_grid import trilinear_sigma

    grid, lo, hi = grid3
    pts = (rays.origins[..., None, :]
           + rays.directions[..., None, :] * z_vals[..., :, None])
    sigma = trilinear_sigma(grid, lo, hi, pts)  # [N, S] raw (pre-ReLU)
    raw_t = jnp.concatenate(
        [jnp.full((3,) + sigma.shape, -20.0, jnp.float32), sigma[None]],
        axis=0)
    return raw2outputs_t(raw_t, z_vals, rays.directions,
                         white_bkgd=cfg.white_bkgd, cull_eps=cfg.cull_eps)


def fused_eval_ready(model, fine_model, params, cfg: RenderConfig,
                     tile: int) -> bool:
    """True when every pass of a ``tile``-ray render dispatches to the fused
    kernels, which stream activations through VMEM — so ``netchunk`` (the
    reference's cap on HBM-materialized [points, W] activations,
    run_nerf.py:50-74) is vacuously satisfied and need not shrink the ray
    tile. Mirrors the dispatch predicates of :func:`_composite_from_z`:
    any mismatch only costs the conservative (smaller-tile) policy, never
    correctness.
    """
    from depth_lidar_nerf_tpu.ops.fused_mlp_t import supports_rays_shape

    if not cfg.use_viewdirs:
        return False

    def pass_ok(m, p, S):
        if not supports_rays_shape(S):
            return False
        if hasattr(m, "rays_ok") and not m.rays_ok(tile):
            return False
        if cfg.num_semantic_classes > 0:
            int8_sem = (cfg.render_int8
                        and hasattr(m, "apply_rays_semantic_q8"))
            return (hasattr(m, "apply_rays_semantic")
                    and m.supports_raw_semantic(
                        p, cfg, n_points=0 if int8_sem else tile * S, S=S))
        return (hasattr(m, "apply_rays")
                and hasattr(m, "supports_raw")
                and getattr(m, "supports_rays_path", m.supports_raw)(p, cfg))

    # Grid serving (render_rays' density_grid branch) never runs the coarse
    # MLP, so only the fine pass gates the tile policy there.
    grid_serving = (cfg.render_grid > 0 and cfg.N_importance > 0
                    and hasattr(params, "get")
                    and params.get("density_grid") is not None)
    if not grid_serving and not pass_ok(model, params["coarse"],
                                        cfg.N_samples):
        return False
    if cfg.N_importance > 0:
        fm = fine_model if fine_model is not None else model
        fp = params["fine"] if fine_model is not None else params["coarse"]
        fine_only = (cfg.render_fine_only
                     or (grid_serving and cfg.render_grid_fine_only))
        s_fine = (cfg.N_importance if fine_only
                  else cfg.N_samples + cfg.N_importance)
        return pass_ok(fm, fp, s_fine)
    return True


def render_rays(
    model,
    fine_model,
    params: Dict[str, Any],
    rays: Rays,
    cfg: RenderConfig,
    rng: jax.Array | None = None,
) -> Dict[str, jnp.ndarray]:
    """Coarse + hierarchical-fine volumetric rendering of a ray batch.

    Returns the reference's result dictionary (``run_nerf.py:648-663``):
    ``rgb_map/disp_map/acc_map/depth_map/weights`` for the fine pass plus
    ``*_0`` coarse maps, ``z_std``, and ``sem_preds``/``sem_preds0`` when the
    semantic head is active. ``params`` holds ``{"coarse": ..., "fine": ...}``.
    """
    k_strat = k_noise_c = k_pdf = k_noise_f = None
    if rng is not None:
        k_strat, k_noise_c, k_pdf, k_noise_f = jax.random.split(rng, 4)

    import os as _os

    # Grid serving needs the fine pass to paint the image (the grid coarse
    # composite has no RGB) — with N_importance=0 fall back to the MLP.
    grid = (params.get("density_grid")
            if cfg.render_grid > 0 and cfg.N_importance > 0
            and hasattr(params, "get") else None)
    # A finer grid CDF costs ~nothing (lookups, not MLP evals).
    n_strat = (cfg.render_grid_samples or cfg.N_samples) if grid is not None \
        else cfg.N_samples
    z_vals = stratified_z_vals(
        rays.near, rays.far, n_strat,
        lindisp=cfg.lindisp, perturb=cfg.perturb, rng=k_strat,
    )
    if grid is not None:
        # Serving: coarse sample placement from the baked sigma grid — no
        # coarse MLP pass at all (ops/density_grid.py).
        coarse = _composite_from_grid(grid, rays, z_vals, cfg)
    else:
        coarse = _composite_from_z(
            model, params["coarse"], rays, z_vals, cfg, k_noise_c,
            save_acts=_os.environ.get("DLNERF_ACTS_COARSE", "0") == "1")

    ret = {
        "rgb_map": coarse.rgb, "disp_map": coarse.disp, "acc_map": coarse.acc,
        "depth_map": coarse.depth, "weights": coarse.weights,
    }
    if coarse.semantic is not None:
        ret["sem_preds"] = coarse.semantic

    if cfg.N_importance > 0:
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        if cfg.use_pallas_sampling:
            from depth_lidar_nerf_tpu.ops.sampling_pallas import sample_pdf_pallas

            z_samples = sample_pdf_pallas(
                z_mid, coarse.weights[..., 1:-1], cfg.N_importance,
                det=not cfg.perturb, rng=k_pdf,
            )
        else:
            z_samples = sample_pdf(
                z_mid, coarse.weights[..., 1:-1], cfg.N_importance,
                det=not cfg.perturb, rng=k_pdf,
            )
        z_samples = jax.lax.stop_gradient(z_samples)
        if (cfg.render_fine_only
                or (grid is not None and cfg.render_grid_fine_only)):
            # Fine-only serving: the visible pass evaluates ONLY the
            # importance samples the CDF (grid or coarse MLP) placed.
            z_all = jnp.sort(z_samples, axis=-1)
        else:
            z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1),
                             axis=-1)
        # Fine-pass forward-cull sort key: the coarse pass's expected
        # termination depth; unterminated (low-acc) rays sort last. Only an
        # ordering heuristic — exactness never depends on it.
        fine_key = None
        if cfg.cull_eps > 0.0:
            fine_key = coarse.depth + (1.0 - coarse.acc) * 1e6
        # Fine pass saves its activations for the no-recompute backward
        # (ops/fused_mlp_t: bwd_acts_enabled); the coarse pass stays on the
        # recompute+cull backward, where its ~45-50% cull wins.
        fine = _composite_from_z(
            fine_model if fine_model is not None else model,
            params["fine"] if fine_model is not None else params["coarse"],
            rays, z_all, cfg, k_noise_f, fwd_sort_key=fine_key,
            save_acts=True,
        )
        ret.update({
            "rgb0": coarse.rgb, "disp0": coarse.disp, "acc0": coarse.acc,
            "depth_map0": coarse.depth,
            "rgb_map": fine.rgb, "disp_map": fine.disp, "acc_map": fine.acc,
            "depth_map": fine.depth, "weights": fine.weights,
            "z_std": jnp.std(z_samples, axis=-1),
        })
        if fine.semantic is not None:
            # The baked-grid coarse pass has no semantic head; eval renders
            # only consume the fine maps, so a zero stand-in keeps the
            # output pytree shape stable.
            ret["sem_preds0"] = (coarse.semantic
                                 if coarse.semantic is not None
                                 else jnp.zeros_like(fine.semantic))
            ret["sem_preds"] = fine.semantic
    return ret


def pick_render_tile(model, fine_model, params, cfg: RenderConfig, n: int,
                     fused_cap: int | None = None,
                     flax_cap: int | None = None) -> int:
    """Ray-tile policy for :func:`render_rays_tiled` (and the train step's
    no-grad patch render, which passes tighter ``fused_cap``/``flax_cap``).

    Readiness is evaluated at the ACTUAL tile (post-clamp to the ``n`` rays
    being rendered and to ``fused_cap``): the per-tile dispatch re-checks
    e.g. mesh divisibility (``rays_ok``), and a tile that fails it falls to
    the Flax path, where the fused policy's netchunk bypass is no longer
    vacuously safe — so a render whose clamped tile is not fused-ready must
    take the netchunk-honoring tile instead."""
    fused_tile = min(cfg.render_tile(fused=True), max(n, 1))
    if fused_cap is not None:
        fused_tile = min(fused_tile, fused_cap)
    if fused_eval_ready(model, fine_model, params, cfg, fused_tile):
        return fused_tile
    tile = cfg.render_tile()
    return tile if flax_cap is None else min(tile, flax_cap)


@functools.lru_cache(maxsize=64)
def _tiled_render_jit(model, fine_model, cfg: RenderConfig, with_rng: bool):
    """Compiled tile loop, cached across calls.

    An *eager* ``lax.map`` re-lowers and recompiles the whole dual-pass
    renderer on EVERY call; with remote XLA compilation (the axon tunnel)
    that cost a measured ~30s per ``i_img``/testset event, dominating the
    driver's windowed rays/s every ``i_img`` iterations (PERF.md round 3,
    "Eval-path recompiles"). Caching the jitted closure makes repeat renders
    pay compile exactly once per (model, config, shape) like the train step.
    Note ``render_rays`` reads ``DLNERF_ACTS_COARSE`` at trace time, so env
    changes between calls of one process don't take effect here (they never
    did for the train step either).
    """

    @jax.jit
    def run(params, tiles, tile_keys):
        def body(args):
            r, k = args
            return render_rays(model, fine_model, params, r, cfg,
                               rng=k if with_rng else None)

        return jax.lax.map(body, (tiles, tile_keys))

    return run


def render_rays_tiled(
    model,
    fine_model,
    params: Dict[str, Any],
    rays: Rays,
    cfg: RenderConfig,
    rng: jax.Array | None = None,
    tile: int | None = None,
) -> Dict[str, jnp.ndarray]:
    """Render an arbitrarily large ray batch in HBM-bounded tiles.

    The tile loop is a compiled ``lax.map`` (the TPU replacement for the
    reference's Python ``batchify_rays`` chunk loop, ``run_nerf.py:77-89``);
    the tile size comes from ``cfg.chunk``/``cfg.netchunk`` unless overridden.
    Results are bit-identical to a one-shot :func:`render_rays` when
    ``rng=None``. With an rng, each tile folds in its index.
    """
    n = rays.origins.shape[0]
    if tile is None:
        tile = pick_render_tile(model, fine_model, params, cfg, n)
    tile = min(tile, n)
    n_pad = (-n) % tile
    padded = jax.tree.map(lambda x: jnp.pad(x, ((0, n_pad), (0, 0)), mode="edge"), rays)
    tiles = jax.tree.map(lambda x: x.reshape(-1, tile, x.shape[-1]), padded)
    n_tiles = padded.origins.shape[0] // tile
    tile_keys = (
        jax.random.split(rng, n_tiles) if rng is not None
        else jnp.zeros((n_tiles,), jnp.int32)
    )

    run = _tiled_render_jit(model, fine_model, cfg, rng is not None)
    out = run(params, tiles, tile_keys)
    return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:])[:n], out)


def render_image(
    model,
    fine_model,
    params: Dict[str, Any],
    H: int,
    W: int,
    focal,
    c2w,
    cfg: RenderConfig,
    tile: int | None = None,
) -> Dict[str, jnp.ndarray]:
    """Render a full image pose, tiled over rays to bound HBM.

    Equivalent of ``render(..., c2w=...)`` + chunking (``run_nerf.py:138-189``).
    """
    if (cfg.render_coarse_downsample > 1 and cfg.N_importance > 0
            and H % cfg.render_coarse_downsample == 0
            and W % cfg.render_coarse_downsample == 0
            and (params.get("density_grid") is None
                 if hasattr(params, "get") else True)):
        return render_image_coarse_downsampled(
            model, fine_model, params, H, W, focal, c2w, cfg, tile=tile)
    rays_o, rays_d = camera_rays(H, W, focal, c2w)
    rays = make_rays(rays_o, rays_d, cfg, H, W, focal)
    out = render_rays_tiled(model, fine_model, params, rays, cfg.eval_mode(),
                            rng=None, tile=tile)
    return jax.tree.map(lambda x: x.reshape((H, W) + x.shape[1:]), out)


@functools.lru_cache(maxsize=16)
def _ds_render_jit(model, fine_model, cfg: RenderConfig, H: int, W: int,
                   k: int, focal: float, tile: int):
    """Compiled coarse-downsampled fine-only serving renderer (cached per
    model/config/shape like :func:`_tiled_render_jit`)."""

    Hd, Wd = H // k, W // k

    @jax.jit
    def run(params, c2w):
        # ---- coarse placement pass at (H/k, W/k): rays through the k x k
        # block centers (exact full-res pixel coordinates, not a smaller
        # camera) ----
        jj, ii = jnp.meshgrid(jnp.arange(Hd, dtype=jnp.float32),
                              jnp.arange(Wd, dtype=jnp.float32), indexing="ij")
        coords = jnp.stack([ii * k + (k - 1) * 0.5,
                            jj * k + (k - 1) * 0.5], axis=-1).reshape(-1, 2)
        ro, rd = rays_by_coord(H, W, focal, c2w, coords)
        rays_lo = make_rays(ro, rd, cfg, H, W, focal)
        z_lo = stratified_z_vals(rays_lo.near, rays_lo.far, cfg.N_samples,
                                 lindisp=cfg.lindisp, perturb=False, rng=None)
        coarse = _composite_from_z(model, params["coarse"], rays_lo, z_lo,
                                   cfg, None)
        z_mid = 0.5 * (z_lo[..., 1:] + z_lo[..., :-1])
        z_samples = sample_pdf(z_mid, coarse.weights[..., 1:-1],
                               cfg.N_importance, det=True, rng=None)
        z_samples = jnp.sort(z_samples, axis=-1)  # [Hd*Wd, N_importance]

        # ---- upsample the per-ray sample depths to full resolution ----
        z_full = jnp.repeat(jnp.repeat(
            z_samples.reshape(Hd, Wd, -1), k, axis=0), k, axis=1)
        z_full = z_full.reshape(H * W, -1)

        # ---- full-res fine-only pass, tiled to bound HBM ----
        ro_f, rd_f = camera_rays(H, W, focal, c2w)
        rays_f = make_rays(ro_f, rd_f, cfg, H, W, focal)
        fm = fine_model if fine_model is not None else model
        fkey = "fine" if fine_model is not None else "coarse"

        n = H * W
        n_pad = (-n) % tile
        rays_t = jax.tree.map(
            lambda x: jnp.pad(x, ((0, n_pad), (0, 0)),
                              mode="edge").reshape(-1, tile, x.shape[-1]),
            rays_f)
        z_t = jnp.pad(z_full, ((0, n_pad), (0, 0)),
                      mode="edge").reshape(-1, tile, z_full.shape[-1])

        def body(args):
            r, z = args
            fine = _composite_from_z(fm, params[fkey], r, z, cfg, None)
            out = {"rgb_map": fine.rgb, "disp_map": fine.disp,
                   "acc_map": fine.acc, "depth_map": fine.depth}
            if fine.semantic is not None:
                out["sem_preds"] = fine.semantic
            return out

        out = jax.lax.map(body, (rays_t, z_t))
        out = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:])[:n].reshape(
                (H, W) + x.shape[2:]), out)
        # low-res coarse maps, upsampled — keeps the result dict shape
        # familiar to render_path consumers
        up = lambda a: jnp.repeat(jnp.repeat(  # noqa: E731
            a.reshape((Hd, Wd) + a.shape[1:]), k, axis=0), k, axis=1)
        out.update({"rgb0": up(coarse.rgb), "depth_map0": up(coarse.depth),
                    "acc0": up(coarse.acc)})
        return out

    return run


def render_image_coarse_downsampled(model, fine_model, params, H, W, focal,
                                    c2w, cfg: RenderConfig,
                                    tile: int | None = None):
    """Serving accelerator: coarse CDF at ``(H/k, W/k)``, fine-only at full
    resolution (``cfg.render_coarse_downsample = k``).

    Neighboring rays traverse nearly identical depth structure, so the
    coarse pass — whose ONLY serving job is placing the fine samples
    (run_nerf.py:625-633) — runs on one ray per ``k x k`` pixel block and
    its inverse-CDF depths are shared by the block. Per-ray MLP evals drop
    from ``N_samples + N_importance`` (fine-only) to
    ``N_samples/k^2 + N_importance``; the visible image remains a full-res
    fine-MLP render. Quality-gated in ``tests/test_renderer.py`` and on-chip
    (PERF.md round 5). No reference counterpart (serving mode)."""
    k = cfg.render_coarse_downsample
    if k <= 1 or cfg.N_importance <= 0 or H % k or W % k:
        raise ValueError(
            f"render_coarse_downsample={k} needs k>1, N_importance>0 and "
            f"k | H,W (H={H}, W={W})")
    cfg = cfg.eval_mode()
    if tile is None:
        tile = pick_render_tile(model, fine_model, params,
                                dataclasses.replace(cfg, render_fine_only=True),
                                H * W)
    run = _ds_render_jit(model, fine_model, cfg, H, W, k, float(focal),
                         int(tile))
    return run(params, jnp.asarray(c2w))


def sample_sigma(model, params, rays: Rays, z_vals, cfg: RenderConfig):
    """Query the field at explicit depths: returns (rgb, sigma, ray outputs).

    Parity: ``sample_sigma`` (``run_nerf_helpers.py:598-611``) /
    ``render_test_ray`` (``run_nerf.py:361-386``) — the probing API used for
    depth-ray diagnostics.
    """
    pts = rays.origins[..., None, :] + rays.directions[..., None, :] * z_vals[..., :, None]
    raw = query_network(model, params, pts, rays.viewdirs, cfg)
    raw = raw.astype(jnp.float32)
    rgb = jax.nn.sigmoid(raw[..., :3])
    sigma = jax.nn.relu(raw[..., 3])
    outs = raw2outputs(raw, z_vals, rays.directions,
                       num_semantic_classes=cfg.num_semantic_classes)
    return rgb, sigma, outs


def render_test_ray(model, params, rays: Rays, cfg: RenderConfig):
    """Uniform near->far probe along given rays (run_nerf.py:361-386)."""
    t = jnp.linspace(0.0, 1.0, cfg.N_samples, dtype=jnp.float32)
    z_vals = rays.near * (1.0 - t) + rays.far * t
    rgb, sigma, outs = sample_sigma(model, params, rays, z_vals, cfg)
    return rgb, sigma, z_vals, outs.depth
