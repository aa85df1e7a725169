"""Jitted train steps.

The reference's hot loop (``run_nerf.py:1320-1847``) — batch fetch, render,
seven loss terms, backward, Adam step, GAN discriminator step — compiles here
into a single XLA program per loss-schedule variant. The every-N patch losses
(feature/GAN/smoothness, ``run_nerf.py:1552-1753``) change the computation
graph, so the driver selects between prebuilt step variants host-side instead
of tracing data-dependent Python branches (SURVEY.md §7 "hard parts").

Grad/no-grad patch trick (``run_nerf.py:1600-1644``): the reference renders a
small random subset of patch rays with gradients and the rest under
``no_grad``, then scatters both into one image. Here the no-grad subset is
rendered on ``stop_gradient`` parameters *outside* the differentiated closure
(so no backward FLOPs), and both subsets scatter into the patch with a static
permutation index — same math, one fused program, no Python-side tensor
surgery.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from depth_lidar_nerf_tpu.models.vgg import vgg_normalize
from depth_lidar_nerf_tpu.ops.rays import patch_ray_dirs
from depth_lidar_nerf_tpu.ops.sampling import sample_pdf, stratified_z_vals
from depth_lidar_nerf_tpu.render.renderer import (
    RenderConfig,
    _composite_from_z,
    make_rays,
    pick_render_tile,
    query_network,
    render_rays,
    render_rays_tiled,
)
from depth_lidar_nerf_tpu.train import losses
from depth_lidar_nerf_tpu.train.config import TrainConfig
from depth_lidar_nerf_tpu.train.state import (
    Models,
    TrainState,
    make_disc_optimizer,
    make_optimizer,
)
from depth_lidar_nerf_tpu.parallel.mesh import param_constrainer, ray_sharder
from depth_lidar_nerf_tpu.train.tables import DepthRayTable, RgbRayTable, gather_rays


class PatchBatch(NamedTuple):
    """Per-step inputs for the patch-loss branch (crop + grad-subset split)."""

    c2w: jnp.ndarray  # [3, 4] pose of the sampled train image
    gt_patch: jnp.ndarray  # [nH, nW, 3]
    start_h: jnp.ndarray  # scalar f32 crop origin (traced: no recompiles)
    start_w: jnp.ndarray  # scalar f32
    perm: jnp.ndarray  # [nH * nW] int32; first gradH*gradW entries get grads
    # TABLE-ORDER image position (index within i_train as the rgb table was
    # built) — grid-mode patch legs map patch pixels to table rows for the
    # baked per-ray CDF (ops/ray_cdf.py). None outside grid mode is fine.
    img: Optional[jnp.ndarray] = None  # scalar int32


class PatchSource(NamedTuple):
    """Device-resident train images + poses for IN-JIT patch sampling.

    Building a PatchBatch on the host costs a fresh gt/perm upload over the
    device link every patch iteration (~400ms/iter over the axon tunnel —
    measured to dwarf the 110ms jitted patch step). A step variant handed a
    PatchSource instead derives the image pick, crop origin, permutation and
    gt crop on device from the step's rng key (the reference's host
    np.random picks, run_nerf.py:1557-1568, are matched distributionally,
    same as the ray sampler)."""

    images: jnp.ndarray  # [N_train, H, W, 3] f32
    poses: jnp.ndarray  # [N_train, 3, 4] f32


def sample_patch(src: PatchSource, key, nH: int, nW: int) -> PatchBatch:
    """Draw the patch-iteration randomness on device (see PatchSource)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n_img, H, W, _ = src.images.shape
    img = jax.random.randint(k1, (), 0, n_img)
    sh = jax.random.randint(k2, (), 0, H - nH + 1)
    sw = jax.random.randint(k3, (), 0, W - nW + 1)
    gt = jax.lax.dynamic_slice(src.images[img],
                               (sh, sw, jnp.int32(0)), (nH, nW, 3))
    perm = jax.random.permutation(k4, nH * nW).astype(jnp.int32)
    # PatchSource images are scene.images[i_train] — the same order the rgb
    # table was built in — so `img` IS the table image position.
    return PatchBatch(src.poses[img], gt, sh.astype(jnp.float32),
                      sw.astype(jnp.float32), perm, img.astype(jnp.int32))


class StepFns(NamedTuple):
    base: Any  # (state, rgb_table, depth_table, rng) -> (state, metrics)
    patch: Any  # + (patch, vgg_params); None if no patch losses configured


class StepPlan(NamedTuple):
    """What build_step_fns hands the train loop."""

    select: Any  # i -> (step_fn, needs_patch)
    variant_key: Any  # i -> (feature_on, gan_on, smooth_on, precrop_on)
    get_multi: Any  # (k, precrop_on) -> K-step scan fn
    get_cycle: Any  # (pre_steps, patch_key) -> fused period fn


def _sigma_loss_term(cfg, rcfg, models, params, rays, target_depth, rng):
    """DS-NeRF sigma loss: sample [near, gt_depth], query the fine field
    (loss.py:15-44)."""
    k_strat, k_noise = jax.random.split(rng)
    z = stratified_z_vals(
        rays.near, target_depth[:, None], cfg.N_samples,
        perturb=rcfg.perturb, rng=k_strat,
    )
    pts = rays.origins[..., None, :] + rays.directions[..., None, :] * z[..., :, None]
    net = models.fine if models.fine is not None else models.coarse
    net_params = params["fine"] if models.fine is not None else params["coarse"]
    raw = query_network(net, net_params, pts, rays.viewdirs, rcfg)
    sigma_raw = raw[..., 3].astype(jnp.float32)
    if rcfg.raw_noise_std > 0:
        sigma_raw = sigma_raw + jax.random.normal(k_noise, sigma_raw.shape) * rcfg.raw_noise_std
    sigma = jax.nn.relu(sigma_raw)
    return jnp.mean(losses.sigma_loss_from_sigma(sigma))


def _assemble_patch(values_grad, values_ng, perm, n_grad, nH, nW):
    """Scatter grad + no-grad ray results back into patch scanline order.

    values_*: [B, n, C]. Returns [B, nH, nW, C].
    """
    B, _, C = values_grad.shape
    full = jnp.zeros((B, nH * nW, C), values_grad.dtype)
    full = full.at[:, perm[:n_grad]].set(values_grad)
    full = full.at[:, perm[n_grad:]].set(values_ng)
    return full.reshape(B, nH, nW, C)


def make_train_step(
    cfg: TrainConfig,
    rcfg: RenderConfig,
    models: Models,
    hwf,
    *,
    feature_on: bool = False,
    gan_on: bool = False,
    smooth_on: bool = False,
    precrop_on: bool = False,
    mesh=None,
    k_steps: int = 1,
    grid_mode: bool = False,
    _jit: bool = True,
):
    """Build one jitted step for a given loss-schedule variant.

    With ``grid_mode`` (``--grid_train``, active past ``grid_train_after``)
    the step takes a trailing ``aux: ops.ray_cdf.RayCDF`` argument — the
    fine model's compositing weights baked along every table ray by the
    driver — and the coarse pass becomes one [N, S_cdf] row gather +
    inverse-CDF instead of the coarse MLP: the coarse MLP's forward AND
    backward disappear from the program, and with them the ``img_loss0`` /
    coarse-semantic/patch-coarse terms whose only purpose was training that
    MLP's placement field (run_nerf.py:571-600, 1759-1762). The fine pass
    is unchanged (it still evaluates the stratified+importance union unless
    ``grid_train_fine_only``), so the trajectory differs from two-MLP
    training only through the importance-sample placement. (A 3-D-grid
    trilinear coarse pass was built and measured first: XLA's TPU gather ran
    the 8-corner lookup at [16k, 64] in 61 ms vs the 43 ms full step —
    see ops/ray_cdf.py and PERF.md round 4.)

    With ``mesh``, the gathered ray batch is sharding-constrained over the
    mesh's ray axis so GSPMD partitions render + backward data-parallel and
    emits the gradient psum over ICI (see ``parallel/mesh.py``).

    With ``k_steps > 1`` (non-patch variants only) the returned function runs
    K optimizer steps in ONE device dispatch via ``lax.scan`` — signature
    ``(state, rgb_table, depth_table, patch=None, vgg_params, rng, iters)``
    where ``iters`` is the [K] int32 vector of global iteration indices; the
    per-step RNG is ``fold_in(rng, iters[k])``, exactly the key the unbatched
    loop would have passed, so the loss trajectory is identical at print
    precision. Metrics come back stacked [K]. This exists because one
    dispatch per small step cannot feed the chip (the reference's shipped
    N_rand=1024, configs/fern_dsnerf.txt:6, runs ~8x below the 16k-ray
    throughput shape — PERF.md "small-batch bound").
    """
    shard_rays = ray_sharder(mesh)
    constrain_params = param_constrainer(mesh)
    H, W, focal = int(hwf[0]), int(hwf[1]), float(hwf[2])
    n_depth = int(cfg.N_rand * cfg.depth_rays_prop) if cfg.colmap_depth else 0
    n_rgb = cfg.N_rand - n_depth
    n_grad = cfg.gradH * cfg.gradW
    n_patch = cfg.nH * cfg.nW
    patch_mode = feature_on or gan_on or smooth_on
    optimizer = make_optimizer(cfg)
    disc_opt = make_disc_optimizer(cfg)
    coarse_on = cfg.N_importance > 0 and not cfg.no_coarse and not grid_mode
    if grid_mode and cfg.N_importance <= 0:
        raise ValueError("grid_train needs a fine pass (N_importance > 0)")
    fine_only = grid_mode and cfg.grid_train_fine_only

    def _cdf_render(params, rays, w, z_grid, rng, save_acts,
                    rcfg_r: RenderConfig = rcfg, n_imp: int = 0):
        """Grid-mode render: fine pass only; importance samples come from
        the baked per-ray weights (ops/ray_cdf.py) instead of a coarse MLP
        pass. ``w [N, S_cdf]`` are the rays' table rows, gathered by the
        caller with the same row-gather the step uses for origins.
        ``n_imp`` overrides the per-ray sample count (patch legs with
        --patch_render_samples; 0 = cfg.N_importance)."""
        k_strat, k_pdf, k_noise = jax.random.split(rng, 3)
        n = w.shape[0]
        w32 = w.astype(jnp.float32)
        z_mid = 0.5 * (z_grid[1:] + z_grid[:-1])
        z_samples = sample_pdf(
            jnp.broadcast_to(z_mid, (n, z_mid.shape[0])), w32[:, 1:-1],
            n_imp or cfg.N_importance, det=not rcfg_r.perturb, rng=k_pdf)
        z_samples = jax.lax.stop_gradient(z_samples)
        if fine_only:
            z_all = jnp.sort(z_samples, axis=-1)
        else:
            z_vals = stratified_z_vals(
                rays.near, rays.far, cfg.N_samples, lindisp=rcfg_r.lindisp,
                perturb=rcfg_r.perturb, rng=k_strat)
            z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1),
                             axis=-1)
        # Forward-cull sort key (same heuristic as render_rays'): expected
        # termination depth from the baked weights; unterminated rays last.
        fine_key = None
        if rcfg_r.cull_eps > 0.0:
            acc = jnp.sum(w32, axis=-1)
            depth_est = jnp.sum(w32 * z_grid, axis=-1) / jnp.maximum(acc, 1e-6)
            fine_key = depth_est + (1.0 - acc) * 1e6
        fm = models.fine if models.fine is not None else models.coarse
        fp = params["fine"] if models.fine is not None else params["coarse"]
        fine = _composite_from_z(fm, fp, rays, z_all, rcfg_r, k_noise,
                                 fwd_sort_key=fine_key, save_acts=save_acts)
        out = {"rgb_map": fine.rgb, "disp_map": fine.disp,
               "acc_map": fine.acc, "depth_map": fine.depth,
               "weights": fine.weights}
        if fine.semantic is not None:
            out["sem_preds"] = fine.semantic
        return out

    def _patch_rows(patch):
        """Map patch pixels to rgb-table rows (scanline order pre-perm)."""
        rr, cc = jnp.meshgrid(jnp.arange(cfg.nH, dtype=jnp.int32),
                              jnp.arange(cfg.nW, dtype=jnp.int32),
                              indexing="ij")
        rows = (patch.img * (H * W)
                + (patch.start_h.astype(jnp.int32) + rr) * W
                + (patch.start_w.astype(jnp.int32) + cc))
        return rows.reshape(-1)[patch.perm]  # perm order, like the rays
    if patch_mode and (cfg.nH > H or cfg.nW > W):
        # The in-jit sampler (sample_patch) would clamp its dynamic_slice and
        # silently train on crops mismatched against patch_ray_dirs.
        raise ValueError(f"patch {cfg.nH}x{cfg.nW} larger than image {H}x{W}")

    def loss_fn(params, state_step, rgb_table, depth_table, patch, ng_patch,
                vgg_params, disc_params, rng, aux=None):
        keys = jax.random.split(rng, 8)
        metrics = {}

        # ---- ray batch: uniform gather from the device-resident tables ----
        if cfg.no_batching:
            # Single-image sampling with optional center precrop
            # (run_nerf.py:1376-1404). With-replacement pixel draws replace
            # the reference's no-replacement np.random.choice.
            n_img = rgb_table.origins.shape[0] // (H * W)
            ki, kr, kc = jax.random.split(keys[0], 3)
            img = jax.random.randint(ki, (), 0, n_img)
            if precrop_on:
                dH = int(H // 2 * cfg.precrop_frac)
                dW = int(W // 2 * cfg.precrop_frac)
                rows = jax.random.randint(kr, (n_rgb,), H // 2 - dH, H // 2 + dH)
                cols = jax.random.randint(kc, (n_rgb,), W // 2 - dW, W // 2 + dW)
            else:
                rows = jax.random.randint(kr, (n_rgb,), 0, H)
                cols = jax.random.randint(kc, (n_rgb,), 0, W)
            idx = img * (H * W) + rows * W + cols
        else:
            idx = jax.random.randint(keys[0], (n_rgb,), 0,
                                     rgb_table.origins.shape[0])
        rays = gather_rays(rgb_table, idx, rcfg)
        target_s = rgb_table.rgb[idx]
        target_sem = rgb_table.semantic[idx] if cfg.semantic_loss else None

        if n_depth > 0:
            idx_d = jax.random.randint(
                keys[1], (n_depth,), 0, depth_table.origins.shape[0]
            )
            rays_depth = gather_rays(depth_table, idx_d, rcfg)
            target_depth = depth_table.depth[idx_d]
            ray_weights = depth_table.weight[idx_d]
            rays_all = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b], axis=0), rays, rays_depth
            )
        else:
            rays_all = rays
        rays_all = shard_rays(rays_all)

        if grid_mode:
            # "Coarse pass" = one [N, S_cdf] row gather of the baked
            # weights + inverse-CDF (ops/ray_cdf.py) — no coarse MLP.
            w_all = aux.w_rgb[idx]
            if n_depth > 0:
                w_all = jnp.concatenate([w_all, aux.w_depth[idx_d]], axis=0)
            out = _cdf_render(params, rays_all, shard_rays(w_all), aux.z,
                              keys[2], save_acts=True)
        else:
            out = render_rays(models.coarse, models.fine, params, rays_all,
                              rcfg, rng=keys[2])

        rgb = out["rgb_map"][:n_rgb]
        img_loss = losses.img2mse(rgb, target_s)
        metrics["img_loss"] = img_loss
        metrics["psnr"] = losses.mse2psnr(img_loss)
        loss = img_loss

        imp = losses.depth_importance(state_step, cfg.lrate_decay)
        metrics["depth_importance"] = imp

        if cfg.depth_loss and n_depth > 0:
            depth_col = out["depth_map"][n_rgb:]
            d_loss = losses.depth_loss(
                depth_col, target_depth, ray_weights,
                weighted=cfg.weighted_loss, normalize=cfg.normalize_depth,
                relative=cfg.relative_loss,
            )
            metrics["depth_loss"] = d_loss
            loss = loss + cfg.depth_lambda * imp * d_loss

        if cfg.sigma_loss and n_depth > 0:
            s_loss = _sigma_loss_term(cfg, rcfg, models, params, rays_depth,
                                      target_depth, keys[3])
            metrics["sigma_loss"] = s_loss
            loss = loss + cfg.sigma_lambda * s_loss

        if cfg.semantic_loss:
            sem_loss = losses.semantic_cross_entropy(
                out["sem_preds"][:n_rgb], target_sem
            )
            metrics["semantic_loss"] = sem_loss
            sem_loss0 = 0.0
            # Grid mode has no coarse semantic head (sem_preds0 is a zero
            # stand-in for pytree stability) — like img_loss0, the coarse CE
            # existed to train the now-deleted coarse MLP.
            if "sem_preds0" in out and not grid_mode:
                sem_loss0 = losses.semantic_cross_entropy(
                    out["sem_preds0"][:n_rgb], target_sem
                )
                metrics["semantic_loss0"] = sem_loss0
            loss = loss + cfg.semantic_lambda * (sem_loss + sem_loss0)

        if coarse_on:
            img_loss0 = losses.img2mse(out["rgb0"][:n_rgb], target_s)
            metrics["img_loss0"] = img_loss0
            metrics["psnr0"] = losses.mse2psnr(img_loss0)
            loss = loss + img_loss0

        # ------------------------- patch losses -------------------------
        rendered_patch = None
        if patch_mode:
            ro, rd = patch_ray_dirs(H, W, focal, patch.c2w, patch.start_h,
                                    patch.start_w, cfg.nH, cfg.nW)
            prays = make_rays(ro, rd, rcfg, H, W, focal)
            grad_rays = shard_rays(
                jax.tree.map(lambda x: x[patch.perm[:n_grad]], prays))
            if grid_mode:
                rows_p = _patch_rows(patch)
                g_out = _cdf_render(params, grad_rays,
                                    shard_rays(aux.w_rgb[rows_p[:n_grad]]),
                                    aux.z, keys[4], save_acts=True,
                                    n_imp=cfg.patch_render_samples)
            else:
                g_out = render_rays(models.coarse, models.fine, params,
                                    grad_rays, rcfg, rng=keys[4])

            def stack_fc(o, key, key0):
                # Grid mode drops the coarse legs of the patch losses (the
                # grid composite has no RGB and the coarse MLP no longer
                # trains) — stacks are [1, ...] fine-only.
                if cfg.N_importance > 0 and not grid_mode:
                    return jnp.stack([o[key], o[key0]], axis=0)
                return o[key][None]

            rgb_g = jnp.clip(stack_fc(g_out, "rgb_map", "rgb0"), 0.0, 1.0)
            rgb_ng = jnp.clip(stack_fc(ng_patch, "rgb_map", "rgb0"), 0.0, 1.0)
            acc_rgb = _assemble_patch(rgb_g, rgb_ng, patch.perm, n_grad,
                                      cfg.nH, cfg.nW)  # [B, nH, nW, 3]
            rendered_patch = acc_rgb

            if smooth_on:
                d_g = stack_fc(g_out, "depth_map", "depth_map0")[..., None]
                d_ng = stack_fc(ng_patch, "depth_map", "depth_map0")[..., None]
                acc_depth = _assemble_patch(d_g, d_ng, patch.perm, n_grad,
                                            cfg.nH, cfg.nW)
                inv_loss = losses.inverse_depth_smoothness_loss(acc_depth, acc_rgb)
                metrics["inv_loss"] = inv_loss
                loss = loss + inv_loss * cfg.depth_inverse_lambda * imp

            if feature_on and cfg.feature_loss_type == "lpips":
                # run_nerf.py:1708-1721: LPIPS distance as the feature loss,
                # optional spatial-map logging.
                gt = patch.gt_patch[None]
                d_fine = models.lpips.apply(vgg_params, gt, acc_rgb[0:1],
                                            normalize=True)
                d_coarse = (models.lpips.apply(vgg_params, gt, acc_rgb[1:2],
                                               normalize=True)
                            if cfg.N_importance > 0 and not grid_mode
                            else None)
                if cfg.lpips_spatial:
                    metrics["lpips_spatial"] = jax.lax.stop_gradient(
                        d_fine[0, ..., 0])
                    feature_loss = jnp.mean(d_fine)
                    fl0 = jnp.mean(d_coarse) if d_coarse is not None else 0.0
                else:
                    feature_loss = d_fine[0]
                    fl0 = d_coarse[0] if d_coarse is not None else 0.0
                if d_coarse is not None:
                    metrics["feature_loss0"] = fl0
                    feature_loss = feature_loss + fl0
                metrics["feature_loss"] = feature_loss
                loss = loss + feature_loss * cfg.feature_lambda

            if feature_on and cfg.feature_loss_type == "vgg":
                layer_names = tuple(cfg.vgg_layers or ())
                weights = cfg.vgg_layer_weights
                gt = vgg_normalize(patch.gt_patch[None])
                feats_gt = jax.lax.stop_gradient(
                    models.vgg.apply(vgg_params, gt)
                )
                feats_r = models.vgg.apply(vgg_params, vgg_normalize(acc_rgb))
                f_fine = {k: v[0:1] for k, v in feats_r.items()}
                feature_loss = losses.vgg_feature_distance(
                    f_fine, feats_gt, layer_names, weights, cfg.vgg_loss_type
                )
                if cfg.N_importance > 0 and not grid_mode:
                    f_coarse = {k: v[1:2] for k, v in feats_r.items()}
                    fl0 = losses.vgg_feature_distance(
                        f_coarse, feats_gt, layer_names, weights, cfg.vgg_loss_type
                    )
                    metrics["feature_loss0"] = fl0
                    feature_loss = feature_loss + fl0
                metrics["feature_loss"] = feature_loss
                loss = loss + feature_loss * cfg.feature_lambda

            if gan_on:
                noise_std = losses.gan_noise_std_at(state_step, cfg.gan_noise_std)
                dp = jax.lax.stop_gradient(disc_params)
                noise = jax.random.normal(keys[5], (1, cfg.nH, cfg.nW, 3)) * noise_std
                pred = models.discriminator.apply(dp, acc_rgb[0:1] + noise)
                gan_loss = losses.gan_mse(pred, 1.0)
                if cfg.N_importance > 0 and not grid_mode:
                    noise0 = jax.random.normal(keys[6], (1, cfg.nH, cfg.nW, 3)) * noise_std
                    pred0 = models.discriminator.apply(dp, acc_rgb[1:2] + noise0)
                    gan_loss = gan_loss + losses.gan_mse(pred0, 1.0)
                metrics["gan_loss"] = gan_loss
                loss = loss + gan_loss * cfg.gan_lambda

        metrics["loss"] = loss
        return loss, (metrics, rendered_patch)

    # --patch_ng_int8: the no-grad leg is forward-only, so the W8A8 serving
    # kernels are legal there (the grad leg and all losses stay bf16).
    rcfg_ng = (dataclasses.replace(rcfg, render_int8=True)
               if cfg.patch_ng_int8 else rcfg)

    def ng_render(params, patch, rng, aux=None):
        """No-grad patch subset on stop_gradient params, HBM-tiled."""
        ro, rd = patch_ray_dirs(H, W, focal, patch.c2w, patch.start_h,
                                patch.start_w, cfg.nH, cfg.nW)
        prays = make_rays(ro, rd, rcfg_ng, H, W, focal)
        ng_rays = shard_rays(jax.tree.map(lambda x: x[patch.perm[n_grad:]], prays))
        p = jax.lax.stop_gradient(params)
        if grid_mode:
            # Fine pass only; the fused primal streams activations through
            # VMEM (save_acts off — nothing differentiates this leg), so no
            # ray tiling is needed even at full-image patches.
            rows_p = _patch_rows(patch)
            w = jax.lax.stop_gradient(aux.w_rgb[rows_p[n_grad:]])
            return _cdf_render(p, ng_rays, shard_rays(w), aux.z, rng,
                               save_acts=False, rcfg_r=rcfg_ng,
                               n_imp=cfg.patch_render_samples)
        # Eval-mode tiles: the no-grad render dominates patch iterations
        # (run_nerf.py:1600-1644 equivalent), and the primal-only fused
        # forward keeps no activations, so the 16k-ray render sweet spot is
        # safe — the old 4096 cap ran the chip ~4x under-fed (PERF.md).
        # A fused-ready render also ignores the shipped netchunk=16384 ray
        # throttle (fern_dsnerf.txt:14 is a GPU-memory workaround).
        # The 16k-ray sweet spot is only safe on the fused (VMEM-streaming)
        # path; the Flax fallback materializes [tile*S, W] activations in
        # HBM, so it keeps the conservative 4096 cap. pick_render_tile
        # checks readiness at the EXACT tile that will run.
        tile = pick_render_tile(models.coarse, models.fine, p, rcfg_ng,
                                ng_rays.origins.shape[0],
                                fused_cap=16384, flax_cap=4096)
        return render_rays_tiled(models.coarse, models.fine, p, ng_rays,
                                 rcfg_ng, rng=rng, tile=tile)

    def disc_step(state, gt_patch, fake_patches, rng, noise_step):
        """Discriminator update on detached patches (run_nerf.py:1779-1816).

        ``noise_step`` is the pre-update iteration index so G and D share the
        same decayed noise std within one iteration, as the reference's
        once-per-iteration schedule does (run_nerf.py:1860-1862)."""
        noise_std = losses.gan_noise_std_at(noise_step, cfg.gan_noise_std)
        k_r, k_f, k_f0 = jax.random.split(rng, 3)
        fake = jax.lax.stop_gradient(fake_patches)

        def d_loss_fn(dp):
            noise_real = jax.random.normal(k_r, (1, cfg.nH, cfg.nW, 3)) * noise_std
            noise_fake = jax.random.normal(k_f, (1, cfg.nH, cfg.nW, 3)) * noise_std
            pred_real = models.discriminator.apply(dp, gt_patch[None] + noise_real)
            pred_fake = models.discriminator.apply(dp, fake[0:1] + noise_fake)
            loss_real = losses.gan_mse(pred_real, 1.0)
            loss_fake = losses.gan_mse(pred_fake, 0.0)
            if cfg.N_importance > 0 and not grid_mode:
                noise_f0 = jax.random.normal(k_f0, (1, cfg.nH, cfg.nW, 3)) * noise_std
                pred_f0 = models.discriminator.apply(dp, fake[1:2] + noise_f0)
                loss_fake = 0.5 * (loss_fake + losses.gan_mse(pred_f0, 0.0))
            return loss_fake + loss_real

        ld, g = jax.value_and_grad(d_loss_fn)(state.disc_params)
        upd, new_dopt = disc_opt.update(g, state.disc_opt_state, state.disc_params)
        new_dp = optax.apply_updates(state.disc_params, upd)
        return state.replace(disc_params=new_dp, disc_opt_state=new_dopt), ld

    def _iter_body(state, rng_i, rgb_table, depth_table, patch, vgg_params,
                   aux):
        """One optimizer iteration (+ discriminator step when gan_on).

        ``rng_i`` is the per-iteration key — ``fold_in(global_rng, i)`` —
        so the SAME derivation serves the unbatched step, the K-step scan,
        and the fused cycle (trajectory identity across all dispatch
        shapes; asserted in tests)."""
        k_ng, k_loss, k_disc = jax.random.split(rng_i, 3)
        pre_update_step = state.step
        if patch_mode and isinstance(patch, PatchSource):
            # In-jit patch sampling: no per-iteration host uploads.
            patch = sample_patch(patch, jax.random.fold_in(rng_i, 17),
                                 cfg.nH, cfg.nW)
        ng_patch = (ng_render(state.params, patch, k_ng, aux)
                    if patch_mode else None)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, rendered_patch)), grads = grad_fn(
            state.params, state.step, rgb_table, depth_table, patch, ng_patch,
            vgg_params, state.disc_params, k_loss, aux,
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = constrain_params(optax.apply_updates(state.params, updates))
        state = state.replace(params=new_params,
                              opt_state=constrain_params(new_opt),
                              step=state.step + 1)

        if gan_on:
            state, loss_dis = disc_step(state, patch.gt_patch, rendered_patch,
                                        k_disc, pre_update_step)
            metrics["loss_dis"] = loss_dis
        return state, metrics

    if k_steps > 1:
        def multi_step_fn(state: TrainState, rgb_table: RgbRayTable,
                          depth_table: Optional[DepthRayTable],
                          patch, vgg_params, rng, iters, aux=None):
            # Patch variants scan too (round 5): the GAN phase makes EVERY
            # iteration a patch iteration (run_nerf.py:1552-1554), and the
            # in-jit sampler makes the scan body self-contained. A
            # PatchBatch (fixed crop) cannot be scanned — it would repeat
            # the same crop every inner step.
            if patch_mode and not isinstance(patch, PatchSource):
                raise ValueError(
                    "k_steps batching of a patch variant needs a "
                    "PatchSource (in-jit sampling), not a fixed PatchBatch")

            def body(st, it):
                return _iter_body(st, jax.random.fold_in(rng, it),
                                  rgb_table, depth_table,
                                  patch if patch_mode else None,
                                  vgg_params, aux)

            return jax.lax.scan(body, state, iters)

        if _jit:
            return jax.jit(multi_step_fn, donate_argnums=(0,))
        return multi_step_fn

    def step_fn(state: TrainState, rgb_table: RgbRayTable,
                depth_table: Optional[DepthRayTable],
                patch: Optional[PatchBatch], vgg_params, rng, aux=None):
        return _iter_body(state, rng, rgb_table, depth_table, patch,
                          vgg_params, aux)

    if _jit:
        return jax.jit(step_fn, donate_argnums=(0,))
    return step_fn


def make_cycle_step(cfg: TrainConfig, rcfg: RenderConfig, models: Models,
                    hwf, *, pre_steps: int, feature_on=False, gan_on=False,
                    smooth_on=False, precrop_on=False, grid_mode=False,
                    prefix=(False, False, False), mesh=None):
    """Fuse one loss-schedule PERIOD into a single device dispatch.

    The flagship mix interleaves 9 plain iterations with one patch-loss
    iteration (``feature_loss_every_n=10``, run_nerf.py:1552-1554). The
    driver used to issue that period as three dispatches (an 8-step scan, a
    1-step remainder, the patch step), and on the tunneled chip each
    dispatch costs ~5 ms of enqueue latency against a ~1 ms compute step
    (scripts/profile_patch_step.py) — the patch WINDOW rate was dominated
    by launch overhead, not math. This builder composes the K-step scan
    body and the patch step — the same traced code, NOT re-implementations
    — into one jitted program: signature matches the multi-step variant,
    ``iters`` is the [pre_steps + 1] int32 vector whose LAST entry is the
    patch iteration. Per-step RNG derivation is identical to the unbatched
    driver (``fold_in(rng, iter)``), so the trajectory is unchanged
    (asserted exactly in tests/test_dispatch_batching.py).
    """
    if pre_steps < 1:
        raise ValueError("make_cycle_step needs pre_steps >= 1")
    pf, pg, ps = prefix
    prefix_patch = pf or pg or ps  # prefix steps need the PatchSource too
    base = make_train_step(
        cfg, rcfg, models, hwf, mesh=mesh, precrop_on=precrop_on,
        feature_on=pf, gan_on=pg, smooth_on=ps,
        k_steps=pre_steps, grid_mode=grid_mode, _jit=False)
    patch_step = make_train_step(
        cfg, rcfg, models, hwf, mesh=mesh, feature_on=feature_on,
        gan_on=gan_on, smooth_on=smooth_on, precrop_on=precrop_on,
        grid_mode=grid_mode, _jit=False)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def cycle_fn(state: TrainState, rgb_table: RgbRayTable,
                 depth_table: Optional[DepthRayTable], patch, vgg_params,
                 rng, iters, aux=None):
        p_base = patch if prefix_patch else None
        if pre_steps == 1:
            # k_steps=1 builds the single-step signature (rng pre-folded)
            state, _ = base(state, rgb_table, depth_table, p_base,
                            vgg_params, jax.random.fold_in(rng, iters[0]),
                            aux)
        else:
            state, _ = base(state, rgb_table, depth_table, p_base,
                            vgg_params, rng, iters[:-1], aux)
        return patch_step(state, rgb_table, depth_table, patch, vgg_params,
                          jax.random.fold_in(rng, iters[-1]), aux)

    return cycle_fn


def build_step_fns(cfg: TrainConfig, rcfg: RenderConfig, models: Models, hwf,
                   mesh=None):
    """Base step + (if configured) the patch-loss step variants.

    Variant selection per iteration i (run_nerf.py:1552-1554):
    feature on iff ``feature_loss and i >= start and i % every_n == 0``;
    gan on iff ``gan_loss and i >= gan_start``; smooth on iff
    ``depth_inverse_loss and i % every_n == 0``.
    """
    base = make_train_step(cfg, rcfg, models, hwf, mesh=mesh)
    variants = {(False, False, False, False, False): base}
    multi_variants = {}

    def get_variant(feature_on, gan_on, smooth_on, precrop_on, grid_on=False):
        key = (feature_on, gan_on, smooth_on, precrop_on, grid_on)
        if key not in variants:
            variants[key] = make_train_step(
                cfg, rcfg, models, hwf, mesh=mesh,
                feature_on=feature_on, gan_on=gan_on, smooth_on=smooth_on,
                precrop_on=precrop_on, grid_mode=grid_on,
            )
        return variants[key]

    def variant_key(i: int):
        feature_on = bool(cfg.feature_loss and i >= cfg.feature_start_iteration
                          and i % cfg.feature_loss_every_n == 0)
        gan_on = bool(cfg.gan_loss and i >= cfg.gan_start_iteration)
        smooth_on = bool(cfg.depth_inverse_loss
                         and i % cfg.depth_inverse_loss_every_n == 0)
        precrop_on = bool(cfg.no_batching and i < cfg.precrop_iters)
        grid_on = bool(cfg.grid_train and i > cfg.grid_train_after)
        return (feature_on, gan_on, smooth_on, precrop_on, grid_on)

    def select(i: int):
        key = variant_key(i)
        fn = get_variant(*key)
        return fn, any(key[:3])

    def get_multi(k: int, precrop_on: bool, grid_on: bool = False,
                  patch_key=None):
        """K-step scan of ANY uniform variant (patch variants ride the
        in-jit sampler); cached per (k, variant)."""
        f, g, sm = (patch_key[:3] if patch_key is not None
                    else (False, False, False))
        mkey = (k, precrop_on, grid_on, f, g, sm)
        if mkey not in multi_variants:
            multi_variants[mkey] = make_train_step(
                cfg, rcfg, models, hwf, mesh=mesh, precrop_on=precrop_on,
                feature_on=f, gan_on=g, smooth_on=sm,
                k_steps=k, grid_mode=grid_on)
        return multi_variants[mkey]

    cycle_variants = {}

    def get_cycle(pre_steps: int, patch_key, prefix_key=None):
        """Fused (pre_steps uniform-variant + 1 tail-variant) period fn,
        cached per shape. ``prefix_key`` carries the prefix's own patch
        flags (e.g. the GAN phase fuses 9 gan-only steps + the full
        gan+feature+smooth iteration)."""
        prefix = (prefix_key[:3] if prefix_key is not None
                  else (False, False, False))
        ckey = (pre_steps, patch_key, prefix)
        if ckey not in cycle_variants:
            f, g, sm, pc = patch_key[:4]
            grid_on = len(patch_key) > 4 and patch_key[4]
            cycle_variants[ckey] = make_cycle_step(
                cfg, rcfg, models, hwf, mesh=mesh, pre_steps=pre_steps,
                feature_on=f, gan_on=g, smooth_on=sm, precrop_on=pc,
                grid_mode=grid_on, prefix=prefix)
        return cycle_variants[ckey]

    return StepPlan(select, variant_key, get_multi, get_cycle)
