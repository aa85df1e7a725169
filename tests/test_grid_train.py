"""Baked-density-grid TRAINING (--grid_train) tests.

The grid-train mode replaces the coarse MLP pass of the train step with a
trilinear lookup of a sigma grid baked from the live fine model (re-baked
periodically), deleting ~1/3 of the step's MLP FLOPs. No reference
counterpart (the reference always trains both MLPs, run_nerf.py:571-600);
the quality contract is the A/B here: final PSNR within noise of two-MLP
training on the same scene, because the fine pass still evaluates the
stratified + importance union so [near, far] coverage is unchanged.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from depth_lidar_nerf_tpu.data.synthetic import make_scene
from depth_lidar_nerf_tpu.train.config import TrainConfig
from depth_lidar_nerf_tpu.train.loop import train


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene_grid")
    make_scene(str(d), n_images=3, H=24, W=32, focal=30.0, n_depth_points=120)
    return str(d)


def _cfg(scene_dir, tmp_path, **kw):
    base = dict(
        expname="t", basedir=str(tmp_path), datadir=scene_dir,
        dataset_type="llff", factor=0, llffhold=0, test_scene=[2],
        N_rand=96, N_samples=12, N_importance=8, netdepth=2, netwidth=48,
        netdepth_fine=2, netwidth_fine=48, use_viewdirs=True, no_ndc=True,
        N_iters=60, i_print=30, i_weights=60, i_testset=0, i_video=0,
        lrate=5e-3, multires=6, multires_views=2, should_seed=True,
        steps_per_dispatch=1,
        grid_train=True, grid_train_after=20, grid_rebake_every=20,
        grid_train_res=24,
    )
    base.update(kw)
    return TrainConfig(**base)


def _train_psnrs(capsys):
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith("[TRAIN]")]
    return [float(l.split("psnr")[1].split()[0]) for l in lines], out


def test_grid_train_runs_and_psnr_climbs(scene_dir, tmp_path, capsys):
    cfg = _cfg(scene_dir, tmp_path, N_iters=200, i_print=20, i_weights=200,
               grid_train_after=60, grid_rebake_every=40)
    state = train(cfg)
    psnrs, out = _train_psnrs(capsys)
    assert int(state.step) == 200
    assert "baked 24^3 density grid" in out
    # Quality must keep climbing after the switch at iter 60.
    post = [p for i, p in enumerate(psnrs) if (i + 1) * 20 > 60]
    assert post[-1] > psnrs[2] + 1.0, out  # psnrs[2] = iter 60 (switch point)
    assert post[-1] > 18.0, out


def test_grid_train_quality_matches_two_mlp(scene_dir, tmp_path, capsys):
    """A/B on the same scene/seed/schedule: grid-train final PSNR within
    noise of two-MLP training (the grid changes only importance placement;
    the stratified half of the fine samples is identical)."""
    base = dict(N_iters=240, i_print=240, i_weights=240)
    train(_cfg(scene_dir, tmp_path / "two_mlp", grid_train=False, **base))
    p_two, _ = _train_psnrs(capsys)
    train(_cfg(scene_dir, tmp_path / "grid", grid_train_after=80,
               grid_rebake_every=40, **base))
    p_grid, out = _train_psnrs(capsys)
    assert p_grid[-1] > p_two[-1] - 1.5, (p_grid, p_two, out)


def test_grid_train_k_step_batching_consistent(scene_dir, tmp_path):
    """K-step scan blocks must respect re-bake boundaries and reproduce the
    unbatched grid trajectory (the per-step RNG folds with the global
    iteration index either way)."""
    kw = dict(N_iters=48, i_weights=48, i_print=48, grid_train_after=16,
              grid_rebake_every=16)
    s1 = train(_cfg(scene_dir, tmp_path / "a", steps_per_dispatch=1, **kw))
    sk = train(_cfg(scene_dir, tmp_path / "b", steps_per_dispatch=8, **kw))
    assert int(s1.step) == int(sk.step) == 48
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(sk.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_grid_step_drops_coarse_loss_terms(scene_dir, tmp_path):
    """The grid-mode step must not emit img_loss0/psnr0/semantic_loss0 (the
    coarse MLP no longer trains) while the two-MLP step does."""
    from depth_lidar_nerf_tpu.train.config import render_config_from
    from depth_lidar_nerf_tpu.train.loop import load_scene
    from depth_lidar_nerf_tpu.train.state import build_models, init_train_state
    from depth_lidar_nerf_tpu.train.step import make_train_step
    from depth_lidar_nerf_tpu.train.tables import (build_depth_table,
                                                   build_rgb_table)

    cfg = _cfg(scene_dir, tmp_path, semantic_loss=True, semantic_lambda=0.01,
               colmap_depth=True, depth_loss=True)
    scene = load_scene(cfg)
    H, W, focal = scene.hwf
    rcfg = render_config_from(cfg, scene.num_semantic_classes, scene.near,
                              scene.far)
    models = build_models(cfg, rcfg)
    state = init_train_state(cfg, rcfg, models, jax.random.key(0))
    rgb_t = build_rgb_table(scene.images, scene.poses, scene.i_train, H, W,
                            focal, rcfg, scene.segmentation)
    dep_t = build_depth_table(scene.depth_gts, scene.poses, scene.i_train,
                              H, W, focal, rcfg)

    two = make_train_step(cfg, rcfg, models, scene.hwf)
    # the step donates its state argument — keep the returned one
    state, m_two = two(state, rgb_t, dep_t, None, None, jax.random.key(1))
    assert "img_loss0" in m_two and "semantic_loss0" in m_two

    from depth_lidar_nerf_tpu.ops.ray_cdf import bake_ray_cdf

    cdf = bake_ray_cdf(models, state.params, rcfg, rgb_t, dep_t,
                       cfg.N_samples)
    assert cdf.w_rgb.shape == (rgb_t.origins.shape[0], cfg.N_samples)
    state2 = init_train_state(cfg, rcfg, models, jax.random.key(0))
    gstep = make_train_step(cfg, rcfg, models, scene.hwf, grid_mode=True)
    _, m_grid = gstep(state2, rgb_t, dep_t, None, None, jax.random.key(1),
                      cdf)
    assert "img_loss0" not in m_grid and "psnr0" not in m_grid
    assert "semantic_loss0" not in m_grid
    assert "semantic_loss" in m_grid
    assert np.isfinite(float(m_grid["loss"]))


def test_grid_train_fine_only_runs(scene_dir, tmp_path, capsys):
    """The aggressive fine-only variant (N_importance MLP evals per ray)
    trains and improves past the switch."""
    cfg = _cfg(scene_dir, tmp_path, N_iters=200, i_print=20, i_weights=200,
               grid_train_after=80, grid_rebake_every=20,
               grid_train_fine_only=True, grid_train_samples=24,
               N_importance=12)
    state = train(cfg)
    psnrs, out = _train_psnrs(capsys)
    assert int(state.step) == 200
    assert psnrs[-1] > psnrs[3] - 0.5, out  # no collapse after the switch
    assert psnrs[-1] > 15.0, out


def test_grid_train_with_patch_losses(scene_dir, tmp_path):
    """Patch iterations (feature + smoothness) under grid mode: coarse legs
    of the patch losses drop; the run completes."""
    cfg = _cfg(
        scene_dir, tmp_path, N_iters=30, i_weights=30, i_print=30,
        grid_train_after=10, grid_rebake_every=10,
        feature_loss=True, feature_start_iteration=1, feature_loss_every_n=5,
        vgg_layers=["conv1_2"], vgg_layer_weights=[1.0], vgg_loss_type="l1",
        depth_inverse_loss=True, depth_inverse_loss_every_n=5,
        nH=12, nW=16, gradH=4, gradW=4, steps_per_dispatch=0,
    )
    state = train(cfg)
    assert int(state.step) == 30


def test_grid_train_render_only_auto_bakes(scene_dir, tmp_path, capsys):
    """--render_only on a grid-trained checkpoint must route through the
    grid (the coarse MLP is stale) even without --render_grid."""
    cfg = _cfg(scene_dir, tmp_path, N_iters=40, i_weights=40,
               grid_train_after=10, grid_rebake_every=10)
    train(cfg)
    capsys.readouterr()
    cfg2 = cfg.replace(render_only=True, render_test=True)
    train(cfg2)
    out = capsys.readouterr().out
    assert "baked 24^3 density grid" in out
    rendered = os.listdir(os.path.join(str(tmp_path), "t",
                                       "renderonly_test_000040"))
    assert "000.png" in rendered


def test_grid_train_flag_validation(scene_dir, tmp_path):
    with pytest.raises(ValueError, match="fine pass"):
        train(_cfg(scene_dir, tmp_path, N_importance=0))
    with pytest.raises(ValueError, match="grid_train"):
        train(_cfg(scene_dir, tmp_path, grid_train=False,
                   grid_train_fine_only=True))


def test_patch_render_samples_patch_step(scene_dir, tmp_path):
    """--patch_render_samples k renders the patch-loss legs with k fine
    samples per ray in grid mode (the losses see a [nH, nW] image either
    way); k = N_importance must reproduce the default path exactly."""
    import dataclasses as dc

    import jax

    from depth_lidar_nerf_tpu.ops.ray_cdf import bake_ray_cdf
    from depth_lidar_nerf_tpu.train.config import render_config_from
    from depth_lidar_nerf_tpu.train.loop import load_scene
    from depth_lidar_nerf_tpu.train.state import (build_models,
                                                  init_train_state,
                                                  init_vgg_params)
    from depth_lidar_nerf_tpu.train.step import PatchSource, make_train_step
    from depth_lidar_nerf_tpu.train.tables import (build_depth_table,
                                                   build_rgb_table)

    cfg = _cfg(scene_dir, tmp_path, colmap_depth=True, depth_loss=True,
               feature_loss=True,
                    feature_start_iteration=1, feature_loss_every_n=5,
                    vgg_layers=["conv1_2"], vgg_layer_weights=[1.0],
                    vgg_loss_type="l1", nH=12, nW=16, gradH=4, gradW=4,
                    grid_train_fine_only=True)
    scene = load_scene(cfg)
    H, W, focal = scene.hwf
    rcfg = render_config_from(cfg, 0, scene.near, scene.far)
    models = build_models(cfg, rcfg)
    state = init_train_state(cfg, rcfg, models, jax.random.key(0))
    vgg = init_vgg_params(cfg, models, jax.random.key(7))
    rgb_t = build_rgb_table(scene.images, scene.poses, scene.i_train, H, W,
                            focal, rcfg, None)
    dep_t = build_depth_table(scene.depth_gts, scene.poses, scene.i_train,
                              H, W, focal, rcfg)
    cdf = bake_ray_cdf(models, state.params, rcfg, rgb_t, dep_t,
                       cfg.grid_train_samples or cfg.N_samples)
    src = PatchSource(
        images=jnp.asarray(scene.images[scene.i_train], jnp.float32),
        poses=jnp.asarray(scene.poses[scene.i_train, :3, :4], jnp.float32))

    def run(c):
        fn = make_train_step(c, rcfg, models, scene.hwf, grid_mode=True,
                             feature_on=True)
        stx = jax.tree.map(jnp.copy, state)
        stx, m = fn(stx, rgb_t, dep_t, src, vgg, jax.random.key(5), cdf)
        return stx, {k: float(v) for k, v in m.items() if jnp.ndim(v) == 0}

    _, m_def = run(cfg)
    # k = N_importance is the identical program
    _, m_same = run(dc.replace(cfg, patch_render_samples=cfg.N_importance))
    assert m_def == m_same
    # a smaller k still runs and produces finite losses
    _, m_small = run(dc.replace(cfg, patch_render_samples=4))
    assert np.isfinite(m_small["loss"]) and np.isfinite(m_small["feature_loss"])
