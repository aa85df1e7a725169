"""Anatomy of the flagship PATCH iteration on the live chip.

The round-4 flagship window rate (~140k rays/s, grid fine-only) is dominated
by the every-10th patch iterations (94x352 full-image patches: no-grad render
of nH*nW - gradH*gradW rays, grad render of gradH*gradW rays, VGG19 feature
fwd+bwd, smoothness, scatter-assemble). This script times the pieces
separately so the round-5 optimization (VERDICT item 4) targets the real
cost, not a guess:

  base_ms         grid fine-only non-patch step, N_rand (one dispatch)
  base_k8_ms      same, K=8 scan-batched, per-step
  patch_full_ms   feature+smooth patch step (the flagship variant)
  patch_smooth_ms smooth-only patch step (drops VGG fwd+bwd)
  patch_tinygrad_ms  feature+smooth with an 8x8 grad crop (grad-leg delta)
  vgg_fb_ms       bare VGG19 fwd+bwd on one 94x352 patch

Env: PPS_SAMPLES (128), PPS_STEPS (20), PPS_NRAND (1024), PPS_WIDTH (256),
PPS_NI (64; also timed at NI/2 to bisect the ng-render share).
Writes one JSON line.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax
    import jax.numpy as jnp

    from depth_lidar_nerf_tpu.data.synthetic import make_scene
    from depth_lidar_nerf_tpu.ops.ray_cdf import bake_ray_cdf
    from depth_lidar_nerf_tpu.train.config import (TrainConfig,
                                                   render_config_from)
    from depth_lidar_nerf_tpu.train.loop import load_scene
    from depth_lidar_nerf_tpu.train.state import (build_models,
                                                  init_train_state,
                                                  init_vgg_params)
    from depth_lidar_nerf_tpu.train.step import PatchSource, make_train_step
    from depth_lidar_nerf_tpu.train.tables import (build_depth_table,
                                                   build_rgb_table)

    s_cdf = int(os.environ.get("PPS_SAMPLES", 128))
    n_steps = int(os.environ.get("PPS_STEPS", 20))
    n_rand = int(os.environ.get("PPS_NRAND", 1024))
    width = int(os.environ.get("PPS_WIDTH", 256))
    n_imp = int(os.environ.get("PPS_NI", 64))
    n_img = int(os.environ.get("PPS_IMAGES", 4))
    out = {"s_cdf": s_cdf, "n_rand": n_rand, "width": width, "ni": n_imp,
           "images": n_img}

    with tempfile.TemporaryDirectory() as d:
        make_scene(d, n_images=n_img, H=94, W=352, focal=88.0,
                   n_depth_points=8000, backdrop=True, num_classes=19)
        cfg = TrainConfig(
            datadir=d, dataset_type="llff", factor=0, llffhold=0,
            test_scene=[-1], N_rand=n_rand, N_samples=64, N_importance=n_imp,
            netdepth=4, netwidth=width, netdepth_fine=4, netwidth_fine=width,
            use_viewdirs=True, no_ndc=False, raw_noise_std=1.0,
            colmap_depth=True, depth_loss=True, depth_lambda=0.01,
            semantic_loss=True, semantic_lambda=0.01,
            compute_dtype="bfloat16",
            grid_train=True, grid_train_res=128, grid_train_fine_only=True,
            grid_train_samples=s_cdf,
            feature_loss=True, feature_loss_type="vgg",
            vgg_layers=["conv1_2", "conv2_2", "conv3_4", "conv4_4",
                        "conv5_4"],
            vgg_layer_weights=[0.1, 0.1, 1.0, 1.0, 1.0], vgg_loss_type="l1",
            feature_lambda=0.01, feature_start_iteration=1,
            feature_loss_every_n=10,
            depth_inverse_loss=True, depth_inverse_loss_every_n=10,
            depth_inverse_lambda=0.01,
            nH=94, nW=352, gradH=32, gradW=64,
        )
        scene = load_scene(cfg)
        H, W, focal = scene.hwf
        rcfg = render_config_from(cfg, scene.num_semantic_classes,
                                  scene.near, scene.far)
        models = build_models(cfg, rcfg)
        state = init_train_state(cfg, rcfg, models, jax.random.key(0))
        vgg_params = init_vgg_params(cfg, models, jax.random.key(7))
        rgb_t = build_rgb_table(scene.images, scene.poses, scene.i_train,
                                H, W, focal, rcfg, scene.segmentation)
        dep_t = build_depth_table(scene.depth_gts, scene.poses, scene.i_train,
                                  H, W, focal, rcfg)
        src = PatchSource(
            images=jnp.asarray(scene.images[scene.i_train], jnp.float32),
            poses=jnp.asarray(scene.poses[scene.i_train, :3, :4],
                              jnp.float32))

        # settle the fields a little so sample placement is non-degenerate
        warm = make_train_step(cfg, rcfg, models, scene.hwf)
        st = state
        for i in range(100):
            st, m = warm(st, rgb_t, dep_t, None, None, jax.random.key(2 + i))
        _ = float(m["loss"])
        cdf = bake_ray_cdf(models, st.params, rcfg, rgb_t, dep_t, s_cdf)
        jax.block_until_ready(cdf.w_rgb)

        # the step fns donate their state arg — re-materialize a fresh
        # device copy from a host snapshot for every measurement
        st_host = jax.device_get(st)

        def time_step(fn, needs_patch, n=n_steps, aux=cdf):
            p = src if needs_patch else None
            stx = jax.tree.map(jnp.asarray, st_host)
            stx, m = fn(stx, rgb_t, dep_t, p, vgg_params,
                        jax.random.key(1), aux)
            sync = lambda x: float(jnp.asarray(x).reshape(-1)[-1])
            _ = sync(m["loss"])  # compile + settle
            t0 = time.perf_counter()
            for i in range(n):
                stx, m = fn(stx, rgb_t, dep_t, p, vgg_params,
                            jax.random.key(50_000 + i), aux)
            _ = sync(m["loss"])
            return (time.perf_counter() - t0) / n * 1e3

        mk = lambda **kw: make_train_step(cfg, rcfg, models, scene.hwf,
                                          grid_mode=True, **kw)
        out["base_ms"] = round(time_step(mk(), False), 2)

        k8 = make_train_step(cfg, rcfg, models, scene.hwf, grid_mode=True,
                             k_steps=8)

        def k8_fn(stx, rt, dt, p, vp, key, aux):
            return k8(stx, rt, dt, None, vp, key,
                      jnp.arange(100, 108, dtype=jnp.int32), aux)

        out["base_k8_ms"] = round(time_step(k8_fn, False) / 8.0, 2)

        out["patch_full_ms"] = round(
            time_step(mk(feature_on=True, smooth_on=True), True), 2)
        out["patch_smooth_ms"] = round(
            time_step(mk(smooth_on=True), True), 2)

        cfg_tiny = dataclasses.replace(cfg, gradH=8, gradW=8)
        tiny = make_train_step(cfg_tiny, rcfg, models, scene.hwf,
                               grid_mode=True, feature_on=True,
                               smooth_on=True)
        out["patch_tinygrad_ms"] = round(time_step(tiny, True), 2)

        # halve the fine samples on the whole patch step: the delta is the
        # MLP-render share of the patch iteration
        cfg_h = dataclasses.replace(cfg, N_importance=n_imp // 2)
        rcfg_h = dataclasses.replace(rcfg, N_importance=n_imp // 2)
        half = make_train_step(cfg_h, rcfg_h, models, scene.hwf,
                               grid_mode=True, feature_on=True,
                               smooth_on=True)
        out["patch_half_ni_ms"] = round(time_step(half, True), 2)

        # pure dispatch floor: a trivial donated-state jit round
        import functools

        @functools.partial(jax.jit, donate_argnums=(0,))
        def bump(stx):
            return stx.replace(step=stx.step + 1), stx.step

        stx = jax.tree.map(jnp.asarray, st_host)
        stx, v = bump(stx)
        _ = int(v)
        t0 = time.perf_counter()
        for _i in range(50):
            stx, v = bump(stx)
        _ = int(v)
        out["noop_dispatch_ms"] = round((time.perf_counter() - t0) / 50 * 1e3,
                                        2)

        # bare VGG19 fwd+bwd at patch shape
        from depth_lidar_nerf_tpu.models.vgg import vgg_normalize
        from depth_lidar_nerf_tpu.train import losses as L
        gt = jnp.zeros((1, 94, 352, 3), jnp.float32) + 0.5

        @jax.jit
        def vgg_fb(img):
            def f(x):
                feats = models.vgg.apply(vgg_params, vgg_normalize(x))
                tgt = jax.tree.map(jax.lax.stop_gradient, feats)
                return L.vgg_feature_distance(
                    feats, tgt, tuple(cfg.vgg_layers),
                    cfg.vgg_layer_weights, cfg.vgg_loss_type)
            return jax.grad(f)(img).sum()

        _ = float(vgg_fb(gt))
        t0 = time.perf_counter()
        for _ in range(n_steps):
            v = vgg_fb(gt)
        _ = float(v)
        out["vgg_fb_ms"] = round((time.perf_counter() - t0) / n_steps * 1e3,
                                 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
