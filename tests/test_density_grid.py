"""Baked-density-grid serving path (ops/density_grid.py).

The grid replaces the coarse MLP pass of eval renders with a trilinear
raw-sigma lookup; the fine pass is untouched. These tests pin the trilinear
math (exact for (tri)linear fields), the bake's agreement with the model it
baked from, and the render_rays dispatch + tolerance against a full render.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_trilinear_exact_at_voxel_centers():
    from depth_lidar_nerf_tpu.ops.density_grid import trilinear_sigma

    R = 5
    grid = jax.random.normal(jax.random.key(0), (R, R, R))
    lo = jnp.array([-1.0, 0.0, 2.0])
    hi = jnp.array([1.0, 3.0, 4.0])
    axes = [jnp.linspace(lo[i], hi[i], R) for i in range(3)]
    pts = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    got = trilinear_sigma(grid, lo, hi, pts)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(grid).reshape(-1), rtol=1e-5,
                               atol=1e-5)


def test_trilinear_reproduces_linear_field_and_clamps():
    """A linear function sampled onto the grid interpolates exactly at any
    interior point; out-of-bounds points clamp to the boundary value."""
    from depth_lidar_nerf_tpu.ops.density_grid import trilinear_sigma

    R = 9
    lo = jnp.zeros(3)
    hi = jnp.ones(3) * 2.0
    axes = [jnp.linspace(0.0, 2.0, R)] * 3
    g = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), -1)
    grid = 0.5 * g[..., 0] - 1.25 * g[..., 1] + 2.0 * g[..., 2] + 0.75

    pts = jax.random.uniform(jax.random.key(1), (256, 3), minval=0.0,
                             maxval=2.0)
    want = 0.5 * pts[:, 0] - 1.25 * pts[:, 1] + 2.0 * pts[:, 2] + 0.75
    got = trilinear_sigma(grid, lo, hi, pts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-4)

    far_out = jnp.array([[9.0, 9.0, 9.0], [-5.0, -5.0, -5.0]])
    got_oob = np.asarray(trilinear_sigma(grid, lo, hi, far_out))
    np.testing.assert_allclose(got_oob[0], float(grid[-1, -1, -1]), rtol=1e-5)
    np.testing.assert_allclose(got_oob[1], float(grid[0, 0, 0]), rtol=1e-5)


def _tiny_model(depth=2, width=32, mr=4, mrv=2):
    from depth_lidar_nerf_tpu.models import NeRFMLP

    model = NeRFMLP(depth=depth, width=width, in_channels=3 + 6 * mr,
                    in_channels_views=3 + 6 * mrv, dtype=jnp.float32)
    pe = jnp.zeros((1, 3 + 6 * mr))
    ve = jnp.zeros((1, 3 + 6 * mrv))
    params = model.init(jax.random.key(1), pe, ve)
    return model, params


def test_bake_matches_model_sigma():
    """Grid values equal the model's raw sigma at the grid points, and the
    trilinear lookup approaches the model between them."""
    from depth_lidar_nerf_tpu.ops.density_grid import (bake_density_grid,
                                                       trilinear_sigma)
    from depth_lidar_nerf_tpu.ops.embedding import positional_encoding
    from depth_lidar_nerf_tpu.render import RenderConfig

    model, params = _tiny_model()
    cfg = RenderConfig(multires=4, multires_views=2, ndc=False,
                       near=2.0, far=6.0)
    lo, hi = np.array([-1.0, -1.0, 2.0]), np.array([1.0, 1.0, 6.0])
    grid, glo, ghi = bake_density_grid(model, params, cfg, lo, hi, 33)
    assert grid.shape == (33, 33, 33)

    pts = jax.random.uniform(jax.random.key(2), (128, 3)) * (
        jnp.asarray(hi) - jnp.asarray(lo)) + jnp.asarray(lo)
    pe = positional_encoding(pts, cfg.multires)
    ve = jnp.zeros((128, 3 + 6 * cfg.multires_views))
    want = np.asarray(model.apply(params, pe, ve)[..., 3])
    got = np.asarray(trilinear_sigma(grid, glo, ghi, pts))
    # 33^3 over a smooth random-init field: interpolation error, not bias.
    assert np.abs(got - want).max() < 0.15
    assert np.abs(got - want).mean() < 0.02


def test_render_rays_grid_dispatch_and_tolerance(monkeypatch):
    """render_rays with a baked grid: (a) never calls the coarse MLP,
    (b) the final fine image stays close to the full two-MLP render — the
    grid only moves the importance-sample placement."""
    import depth_lidar_nerf_tpu.render.renderer as R
    from depth_lidar_nerf_tpu.ops.density_grid import (bake_density_grid,
                                                       frustum_bounds)
    from depth_lidar_nerf_tpu.render import RenderConfig, Rays, render_rays

    model, params = _tiny_model()
    cfg = RenderConfig(N_samples=32, N_importance=32, perturb=False,
                       raw_noise_std=0.0, ndc=False, near=2.0, far=6.0,
                       multires=4, multires_views=2, render_grid=64)
    N = 24
    k = jax.random.key(0)
    ro = jax.random.normal(k, (N, 3)) * 0.1
    rd = jax.random.normal(jax.random.fold_in(k, 1), (N, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    rays = Rays(ro, rd, rd, jnp.full((N, 1), 2.0), jnp.full((N, 1), 6.0))

    lo, hi = frustum_bounds(ro, rd, 2.0, 6.0)
    grid3 = bake_density_grid(model, params, cfg, lo, hi, 64)
    # distinct fine-params OBJECT (same values) so the coarse-call counter
    # below can use identity
    p = {"coarse": params, "fine": jax.tree.map(lambda x: x, params)}
    p_grid = dict(p)
    p_grid["density_grid"] = grid3

    calls = {"coarse": 0}
    orig = R._composite_from_z

    def counting(m, prm, *a, **kw):
        calls["coarse"] += 1 if prm is p["coarse"] else 0
        return orig(m, prm, *a, **kw)

    full = render_rays(model, model, p, rays, cfg)
    monkeypatch.setattr(R, "_composite_from_z", counting)
    fast = render_rays(model, model, p_grid, rays, cfg)
    assert calls["coarse"] == 0  # the grid replaced the coarse MLP pass

    # sample placement differs slightly; the rendered image must not.
    np.testing.assert_allclose(np.asarray(fast["rgb_map"]),
                               np.asarray(full["rgb_map"]), atol=0.02)
    np.testing.assert_allclose(np.asarray(fast["depth_map"]),
                               np.asarray(full["depth_map"]), atol=0.1)
    # grid coarse maps exist (weights drive sample_pdf) but rgb0 is black
    assert float(np.abs(np.asarray(fast["rgb0"])).max()) < 1e-6
    # without cfg.render_grid the grid entry is ignored
    import dataclasses

    off = render_rays(model, model, p_grid, rays,
                      dataclasses.replace(cfg, render_grid=0))
    assert calls["coarse"] >= 1
    np.testing.assert_allclose(np.asarray(off["rgb_map"]),
                               np.asarray(full["rgb_map"]), atol=1e-6)


def test_render_only_grid_flag_plumbing(tmp_path):
    """TrainConfig.render_grid reaches the bake helper and the render config
    it returns, without touching the training RenderConfig."""
    from depth_lidar_nerf_tpu.train.config import (TrainConfig,
                                                   render_config_from)

    cfg = TrainConfig(render_grid=96)
    rcfg = render_config_from(cfg, 0, 2.0, 6.0)
    assert rcfg.render_grid == 0  # training rcfg never grids


def test_render_grid_rejects_no_fine_pass():
    """--render_grid with N_importance=0 would render black frames (the grid
    composite has no RGB); _validate_flags must reject it."""
    from depth_lidar_nerf_tpu.train.config import TrainConfig
    from depth_lidar_nerf_tpu.train.loop import _validate_flags

    with pytest.raises(ValueError, match="render_grid"):
        _validate_flags(TrainConfig(render_grid=64, N_importance=0,
                                    render_only=True))
    _validate_flags(TrainConfig(render_grid=64, N_importance=64,
                                render_only=True))  # fine pass present: ok


def test_render_grid_fine_only_shapes_and_dispatch():
    """Fine-only serving: the fine pass evaluates exactly N_importance
    samples (weights/z_std shapes prove it) and the grid CDF can run at a
    finer stratified count than N_samples."""
    import dataclasses

    from depth_lidar_nerf_tpu.ops.density_grid import (bake_density_grid,
                                                       frustum_bounds)
    from depth_lidar_nerf_tpu.render import RenderConfig, Rays, render_rays

    model, params = _tiny_model()
    cfg = RenderConfig(N_samples=32, N_importance=16, perturb=False,
                       raw_noise_std=0.0, ndc=False, near=2.0, far=6.0,
                       multires=4, multires_views=2, render_grid=48,
                       render_grid_fine_only=True, render_grid_samples=64)
    N = 8
    k = jax.random.key(0)
    ro = jax.random.normal(k, (N, 3)) * 0.1
    rd = jax.random.normal(jax.random.fold_in(k, 1), (N, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    rays = Rays(ro, rd, rd, jnp.full((N, 1), 2.0), jnp.full((N, 1), 6.0))
    lo, hi = frustum_bounds(ro, rd, 2.0, 6.0)
    p = {"coarse": params, "fine": params,
         "density_grid": bake_density_grid(model, params, cfg, lo, hi, 48)}

    out = render_rays(model, model, p, rays, cfg)
    assert out["weights"].shape == (N, cfg.N_importance)  # fine-only pass
    # the grid CDF ran at render_grid_samples stratified points
    assert out["weights0" if "weights0" in out else "rgb0"].shape[0] == N
    full = render_rays(model, model, p, rays,
                       dataclasses.replace(cfg, render_grid_fine_only=False,
                                           render_grid_samples=0))
    assert full["weights"].shape == (N, cfg.N_samples + cfg.N_importance)
    # random-init fields are smooth: fine-only stays in the neighborhood
    # (true quality is pinned by the converged-model A/B in PERF.md: 40.3 dB
    # vs the full render at 4k iters; 16 vs 48 MLP evals legitimately differ
    # more on an untrained field)
    np.testing.assert_allclose(np.asarray(out["rgb_map"]),
                               np.asarray(full["rgb_map"]), atol=0.1)


def test_render_grid_fine_only_requires_grid():
    from depth_lidar_nerf_tpu.train.config import TrainConfig
    from depth_lidar_nerf_tpu.train.loop import _validate_flags

    with pytest.raises(ValueError, match="render_grid_fine_only"):
        _validate_flags(TrainConfig(render_grid_fine_only=True,
                                    render_only=True))
    with pytest.raises(ValueError, match="render_grid_fine_only"):
        _validate_flags(TrainConfig(render_grid_samples=128,
                                    render_only=True))


def test_render_fine_only_no_grid():
    """--render_fine_only (no grid): the coarse MLP still runs and places
    the importance samples, but the fine pass evaluates ONLY those
    N_importance samples — and on a smooth field the image stays in the
    full render's neighborhood."""
    import dataclasses

    from depth_lidar_nerf_tpu.render import RenderConfig, Rays, render_rays

    model, params = _tiny_model()
    cfg = RenderConfig(N_samples=32, N_importance=16, perturb=False,
                       raw_noise_std=0.0, ndc=False, near=2.0, far=6.0,
                       multires=4, multires_views=2, render_fine_only=True)
    N = 8
    k = jax.random.key(0)
    ro = jax.random.normal(k, (N, 3)) * 0.1
    rd = jax.random.normal(jax.random.fold_in(k, 1), (N, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    rays = Rays(ro, rd, rd, jnp.full((N, 1), 2.0), jnp.full((N, 1), 6.0))
    p = {"coarse": params, "fine": params}

    out = render_rays(model, model, p, rays, cfg)
    assert out["weights"].shape == (N, cfg.N_importance)  # fine-only pass
    # the coarse MLP ran: its maps are a real render, not a zero stand-in
    assert float(np.abs(np.asarray(out["rgb0"])).max()) > 0.0
    full = render_rays(model, model, p, rays,
                       dataclasses.replace(cfg, render_fine_only=False))
    assert full["weights"].shape == (N, cfg.N_samples + cfg.N_importance)
    # Random-init fields are diffuse, so 16 vs 48 MLP evals legitimately
    # disagree on some rays; true serving quality is pinned by the
    # converged-model A/B (scripts/int8_eval.py — PERF.md round 4). This
    # bound only catches gross dispatch bugs (wrong pass, wrong samples).
    np.testing.assert_allclose(np.asarray(out["rgb_map"]),
                               np.asarray(full["rgb_map"]), atol=0.3)


def test_render_fine_only_requires_fine_pass():
    from depth_lidar_nerf_tpu.train.config import TrainConfig
    from depth_lidar_nerf_tpu.train.loop import _validate_flags

    with pytest.raises(ValueError, match="render_fine_only"):
        _validate_flags(TrainConfig(render_fine_only=True, N_importance=0,
                                    render_only=True))
    _validate_flags(TrainConfig(render_fine_only=True, N_importance=64,
                                render_only=True))


def test_render_fine_only_never_binds_to_training_rcfg():
    """Like render_int8, --render_fine_only is an EVAL-render knob: the
    RenderConfig derived for the train step must not carry it."""
    from depth_lidar_nerf_tpu.train.config import TrainConfig, render_config_from

    cfg = TrainConfig(render_fine_only=True)
    rcfg = render_config_from(cfg, 0, 2.0, 6.0)
    assert rcfg.render_fine_only is False
