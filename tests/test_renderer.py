"""Renderer integration tests on the CPU backend."""

import numpy as np

import jax
import jax.numpy as jnp

from depth_lidar_nerf_tpu.models import NeRFMLP
from depth_lidar_nerf_tpu.ops.embedding import embedding_dim
from depth_lidar_nerf_tpu.render import RenderConfig, make_rays, render_image, render_rays


def _setup(num_sem=0, n_importance=8):
    cfg = RenderConfig(N_samples=16, N_importance=n_importance, perturb=True,
                       raw_noise_std=1.0, ndc=False, near=2.0, far=6.0,
                       num_semantic_classes=num_sem, multires=4, multires_views=2)
    pts_dim = embedding_dim(3, cfg.multires)
    views_dim = embedding_dim(3, cfg.multires_views)
    model = NeRFMLP(depth=2, width=32, in_channels=pts_dim,
                    in_channels_views=views_dim, num_semantic_classes=num_sem)
    fine = NeRFMLP(depth=2, width=32, in_channels=pts_dim,
                   in_channels_views=views_dim, num_semantic_classes=num_sem)
    pe = jnp.zeros((1, pts_dim))
    ve = jnp.zeros((1, views_dim))
    params = {
        "coarse": model.init(jax.random.key(0), pe, ve),
        "fine": fine.init(jax.random.key(1), pe, ve),
    }
    return cfg, model, fine, params


def _rand_rays(cfg, n=32, seed=0):
    k = jax.random.key(seed)
    ro = jax.random.normal(k, (n, 3))
    rd = jax.random.normal(jax.random.fold_in(k, 1), (n, 3))
    return make_rays(ro, rd, cfg)


def test_render_rays_keys_and_shapes():
    cfg, model, fine, params = _setup(num_sem=3)
    rays = _rand_rays(cfg)
    out = render_rays(model, fine, params, rays, cfg, rng=jax.random.key(2))
    assert out["rgb_map"].shape == (32, 3)
    assert out["rgb0"].shape == (32, 3)
    assert out["depth_map"].shape == (32,)
    assert out["z_std"].shape == (32,)
    assert out["sem_preds"].shape == (32, 3)
    assert out["sem_preds0"].shape == (32, 3)
    assert out["weights"].shape == (32, 16 + 8)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_render_rays_no_importance():
    cfg, model, fine, params = _setup(n_importance=0)
    rays = _rand_rays(cfg)
    out = render_rays(model, None, params, rays, cfg, rng=jax.random.key(2))
    assert "rgb0" not in out and "z_std" not in out
    assert out["weights"].shape == (32, 16)


def test_render_rays_eval_deterministic():
    cfg, model, fine, params = _setup()
    rays = _rand_rays(cfg)
    ecfg = cfg.eval_mode()
    a = render_rays(model, fine, params, rays, ecfg, rng=None)
    b = render_rays(model, fine, params, rays, ecfg, rng=None)
    np.testing.assert_array_equal(np.asarray(a["rgb_map"]), np.asarray(b["rgb_map"]))


def test_render_rays_jit_and_grad():
    cfg, model, fine, params = _setup()
    rays = _rand_rays(cfg)

    @jax.jit
    def loss_fn(p, rng):
        out = render_rays(model, fine, p, rays, cfg, rng=rng)
        return jnp.mean(out["rgb_map"] ** 2) + jnp.mean(out["rgb0"] ** 2)

    g = jax.grad(loss_fn)(params, jax.random.key(0))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


def test_render_image_tiling():
    cfg, model, fine, params = _setup()
    c2w = jnp.eye(4)[:3]
    H, W = 10, 14
    out = render_image(model, fine, params, H, W, 12.0, c2w, cfg, tile=32)
    assert out["rgb_map"].shape == (H, W, 3)
    assert out["depth_map"].shape == (H, W)
    # Tiling must not change values: compare against one-shot render.
    rays_o, rays_d = jax.tree.map(
        lambda x: x.reshape(-1, 3),
        __import__("depth_lidar_nerf_tpu.ops.rays", fromlist=["camera_rays"]).camera_rays(
            H, W, 12.0, c2w),
    )
    rays = make_rays(rays_o, rays_d, cfg)
    ref = render_rays(model, fine, params, rays, cfg.eval_mode(), rng=None)
    np.testing.assert_allclose(
        np.asarray(out["rgb_map"]).reshape(-1, 3), np.asarray(ref["rgb_map"]),
        rtol=1e-5, atol=1e-5,
    )


def test_sample_sigma_and_render_test_ray():
    from depth_lidar_nerf_tpu.render.renderer import render_test_ray, sample_sigma

    cfg, model, fine, params = _setup(n_importance=0)
    rays = _rand_rays(cfg, n=6)
    rgb, sigma, z_vals, depth = render_test_ray(model, params["coarse"], rays, cfg)
    assert rgb.shape == (6, 16, 3) and sigma.shape == (6, 16)
    assert (np.asarray(sigma) >= 0).all()
    assert ((np.asarray(rgb) >= 0) & (np.asarray(rgb) <= 1)).all()
    np.testing.assert_allclose(np.asarray(z_vals[:, 0]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(z_vals[:, -1]), 6.0, rtol=1e-5)


def test_render_rays_with_pallas_sampling_matches_default():
    """use_pallas_sampling through the real renderer dispatch: off-TPU the
    kernel auto-selects interpret mode (it must not crash a CPU host), and
    the deterministic fine-resample path must match the jnp formulation."""
    import dataclasses

    cfg, model, fine, params = _setup()
    rays = _rand_rays(cfg, n=8)
    ecfg = cfg.eval_mode()
    base = render_rays(model, fine, params, rays, ecfg, rng=None)
    pcfg = dataclasses.replace(ecfg, use_pallas_sampling=True)
    got = render_rays(model, fine, params, rays, pcfg, rng=None)
    np.testing.assert_allclose(np.asarray(got["rgb_map"]),
                               np.asarray(base["rgb_map"]), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["depth_map"]),
                               np.asarray(base["depth_map"]), rtol=1e-5,
                               atol=1e-5)


def test_tiled_render_trace_is_cached():
    """Repeat renders must not re-lower the renderer: an eager ``lax.map``
    re-traces and recompiles the whole dual-pass renderer on every call,
    which over remote XLA compilation cost ~30s per i_img/testset event
    (PERF.md round 3, "Eval-path recompiles"). The jitted tile loop is
    lru-cached on (models, config, rng-ness), so a second identical render
    must be a cache hit."""
    from depth_lidar_nerf_tpu.render.renderer import (_tiled_render_jit,
                                                      render_rays_tiled)

    cfg, model, fine, params = _setup()
    rays = _rand_rays(cfg, n=24)
    _tiled_render_jit.cache_clear()
    a = render_rays_tiled(model, fine, params, rays, cfg.eval_mode(), tile=8)
    info = _tiled_render_jit.cache_info()
    assert info.misses == 1 and info.hits == 0
    b = render_rays_tiled(model, fine, params, rays, cfg.eval_mode(), tile=8)
    info = _tiled_render_jit.cache_info()
    assert info.misses == 1 and info.hits == 1
    np.testing.assert_allclose(np.asarray(a["rgb_map"]),
                               np.asarray(b["rgb_map"]), rtol=0, atol=0)


def test_render_image_coarse_downsampled_shapes_and_agreement():
    """--render_coarse_downsample k: coarse CDF at (H/k, W/k), full-res
    fine-only image. Shapes are full-res; on a smooth random-init field the
    result stays in the neighborhood of the per-ray fine-only render (the
    converged-model quality gate is the on-chip A/B in PERF.md round 5)."""
    import dataclasses

    import jax

    from depth_lidar_nerf_tpu.models import NeRFMLP
    from depth_lidar_nerf_tpu.render import RenderConfig
    from depth_lidar_nerf_tpu.render.renderer import (
        render_image, render_image_coarse_downsampled)

    mr, mrv = 4, 2
    model = NeRFMLP(depth=2, width=32, in_channels=3 + 6 * mr,
                    in_channels_views=3 + 6 * mrv, dtype=jnp.float32)
    pe = jnp.zeros((1, 3 + 6 * mr))
    ve = jnp.zeros((1, 3 + 6 * mrv))
    params = {"coarse": model.init(jax.random.key(1), pe, ve),
              "fine": model.init(jax.random.key(2), pe, ve)}
    H, W, focal = 16, 24, 20.0
    c2w = jnp.eye(4)[:3]
    cfg = RenderConfig(N_samples=16, N_importance=8, perturb=False,
                       raw_noise_std=0.0, ndc=False, near=2.0, far=6.0,
                       multires=mr, multires_views=mrv,
                       render_coarse_downsample=2)

    out = render_image_coarse_downsampled(model, model, params, H, W, focal,
                                          c2w, cfg)
    assert out["rgb_map"].shape == (H, W, 3)
    assert out["depth_map"].shape == (H, W)
    assert out["rgb0"].shape == (H, W, 3)  # upsampled coarse
    assert np.all(np.isfinite(np.asarray(out["rgb_map"])))

    # render_image dispatches to the ds path on the same config
    via_dispatch = render_image(model, model, params, H, W, focal, c2w, cfg)
    np.testing.assert_allclose(np.asarray(via_dispatch["rgb_map"]),
                               np.asarray(out["rgb_map"]), atol=1e-6)

    # neighborhood agreement vs per-ray fine-only on the smooth random field
    ref = render_image(model, model, params, H, W, focal, c2w,
                       dataclasses.replace(cfg, render_coarse_downsample=0,
                                           render_fine_only=True))
    diff = np.abs(np.asarray(out["rgb_map"]) - np.asarray(ref["rgb_map"]))
    # random-init CDFs differ per block at depth discontinuities; require
    # bulk agreement (>99% of pixels within 0.1)
    assert float(np.mean(diff > 0.1)) < 0.01, float(np.mean(diff > 0.1))


def test_render_coarse_downsampled_rejects_bad_shapes():
    import pytest as _pytest

    from depth_lidar_nerf_tpu.render import RenderConfig
    from depth_lidar_nerf_tpu.render.renderer import (
        render_image_coarse_downsampled)

    cfg = RenderConfig(render_coarse_downsample=3, N_importance=8, ndc=False)
    with _pytest.raises(ValueError):
        render_image_coarse_downsampled(None, None, {}, 16, 16, 10.0,
                                        jnp.eye(4)[:3], cfg)  # 3 !| 16
