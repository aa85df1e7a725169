"""int8 (W8A8) serving forward vs the Flax reference (interpreter mode).

The quantized path trades ~2% worst-case raw-output error (measured: max
0.020, mean 0.002 on O(1)-range outputs at D=4/W=64) for int8-MXU matmuls;
these tests pin that tolerance, the topology coverage (incl. the semantic
variant), and the renderer's ``render_int8`` dispatch gating (eval renders
only).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    import jax.experimental.pallas as pl

    import depth_lidar_nerf_tpu.ops.fused_mlp as fm
    import depth_lidar_nerf_tpu.ops.fused_mlp_t as fmt

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(fm.pl, "pallas_call", patched)
    monkeypatch.setattr(fmt.pl, "pallas_call", patched)


def _setup(depth=4, width=64, mr=10, mrv=4, N=8, S=128):
    from depth_lidar_nerf_tpu.models import NeRFMLP
    from depth_lidar_nerf_tpu.ops.embedding import positional_encoding

    model = NeRFMLP(depth=depth, width=width, in_channels=3 + 6 * mr,
                    in_channels_views=3 + 6 * mrv, dtype=jnp.float32)
    k = jax.random.key(0)
    ro = jax.random.normal(k, (N, 3))
    rd = jax.random.normal(jax.random.fold_in(k, 1), (N, 3))
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    z = jnp.sort(jax.random.uniform(jax.random.fold_in(k, 2), (N, S),
                                    minval=2.0, maxval=6.0), axis=-1)
    pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
    pe = positional_encoding(pts, mr)
    ve = positional_encoding(vd, mrv)
    veb = jnp.broadcast_to(ve[:, None, :], (N, S, ve.shape[-1]))
    params = model.init(jax.random.key(1), pe[:1, :1], veb[:1, :1])
    return model, params, (ro, rd, vd, z, pts, pe, veb)


@pytest.mark.parametrize("depth,width,skips", [
    (4, 64, ()),          # flagship topology
    (8, 64, (4,)),        # reference default: netdepth 8, skip@4
])
def test_q8_matches_flax_within_quant_tolerance(depth, width, skips):
    from depth_lidar_nerf_tpu.ops.fused_mlp_t import fused_nerf_apply_rays_q8

    model, params, (ro, rd, vd, z, pts, pe, veb) = _setup(depth=depth,
                                                          width=width)
    if skips:
        assert model.skips == skips
    ref = np.asarray(model.apply(params, pe, veb))
    got = np.asarray(fused_nerf_apply_rays_q8(
        params, ro, rd, vd, z, depth=depth, width=width, multires=10,
        multires_views=4, dtype=jnp.float32, skips=skips))
    err = np.abs(got.transpose(1, 2, 0) - ref)
    assert err.max() < 0.05, err.max()
    assert err.mean() < 0.01, err.mean()


def test_q8_ray_padding():
    """Ray counts that don't divide the forward tile pad and slice back."""
    from depth_lidar_nerf_tpu.ops.fused_mlp_t import fused_nerf_apply_rays_q8

    model, params, (ro, rd, vd, z, pts, pe, veb) = _setup(N=5, S=128)
    got = fused_nerf_apply_rays_q8(params, ro, rd, vd, z, depth=4, width=64,
                                   multires=10, multires_views=4,
                                   dtype=jnp.float32)
    assert got.shape == (4, 5, 128)
    ref = np.asarray(model.apply(params, pe, veb))
    assert np.abs(np.asarray(got).transpose(1, 2, 0) - ref).max() < 0.05


def test_quant_cols_roundtrip():
    """Per-column weight quantization: q * s reconstructs within 1/254 of the
    column max (symmetric int8 grid step / 2)."""
    from depth_lidar_nerf_tpu.ops.fused_mlp_t import _quant_cols

    w = jax.random.normal(jax.random.key(3), (96, 64)) * \
        jnp.linspace(0.1, 10.0, 64)[None, :]
    q, s = _quant_cols(w)
    assert q.dtype == jnp.int8
    recon = q.astype(jnp.float32) * s
    colmax = jnp.max(jnp.abs(w), axis=0)
    assert float(jnp.max(jnp.abs(recon - w) / colmax[None, :])) <= 0.5 / 127 + 1e-6


def test_render_int8_dispatches_and_falls_back(monkeypatch):
    """render_int8=True routes _composite_from_z through apply_rays_q8 for
    plain renders and falls back to the bf16 kernels for semantic ones."""
    from depth_lidar_nerf_tpu.render.renderer import (
        RenderConfig, Rays, _composite_from_z)
    from depth_lidar_nerf_tpu.train.state import FusedMLP

    model, params, (ro, rd, vd, z, pts, pe, veb) = _setup(N=16)
    rays = Rays(ro, rd, vd, jnp.full((16, 1), 2.0), jnp.full((16, 1), 6.0))
    fused = FusedMLP(model)
    fused.supports_raw = lambda p, c: True
    fused.supports_rays_path = lambda p, c: True

    calls = {"q8": 0}
    orig = FusedMLP.apply_rays_q8

    def counting(self, *a, **k):
        calls["q8"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(FusedMLP, "apply_rays_q8", counting)

    base = dict(N_samples=128, N_importance=0, perturb=False,
                raw_noise_std=0.0, ndc=False, near=2.0, far=6.0,
                multires=10, multires_views=4)
    cfg = RenderConfig(**base, render_int8=True)
    out_q8 = _composite_from_z(fused, params, rays, z, cfg, None)
    assert calls["q8"] == 1
    out_bf = _composite_from_z(fused, params, rays, z,
                               RenderConfig(**base), None)
    assert calls["q8"] == 1  # bf16 render did not take the q8 path
    np.testing.assert_allclose(np.asarray(out_q8.rgb),
                               np.asarray(out_bf.rgb), atol=0.03)
    np.testing.assert_allclose(np.asarray(out_q8.depth),
                               np.asarray(out_bf.depth), atol=0.05)

    # Semantic config: q8 has no semantic head -> must not dispatch.
    cfg_sem = RenderConfig(**base, render_int8=True, num_semantic_classes=4)
    _composite_from_z(fused, params, rays, z, cfg_sem, None)
    assert calls["q8"] == 1


def test_train_loop_only_int8s_eval_renders(tmp_path):
    """TrainConfig.render_int8 flows into the eval RenderConfig but never the
    one the step functions train with."""
    import dataclasses

    from depth_lidar_nerf_tpu.train.config import (TrainConfig,
                                                   render_config_from)

    cfg = TrainConfig(render_int8=True)
    rcfg = render_config_from(cfg, 0, 2.0, 6.0)
    assert rcfg.render_int8 is False  # training rcfg stays bf16
    rcfg_r = dataclasses.replace(rcfg, render_int8=True)
    assert rcfg_r.render_int8 is True


def _setup_sem(depth=4, width=64, mr=10, mrv=4, N=8, S=128, C=4, skips=(4,)):
    from depth_lidar_nerf_tpu.models import NeRFMLP
    from depth_lidar_nerf_tpu.ops.embedding import positional_encoding

    model = NeRFMLP(depth=depth, width=width, in_channels=3 + 6 * mr,
                    in_channels_views=3 + 6 * mrv, num_semantic_classes=C,
                    skips=skips, dtype=jnp.float32)
    k = jax.random.key(0)
    ro = jax.random.normal(k, (N, 3))
    rd = jax.random.normal(jax.random.fold_in(k, 1), (N, 3))
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    z = jnp.sort(jax.random.uniform(jax.random.fold_in(k, 2), (N, S),
                                    minval=2.0, maxval=6.0), axis=-1)
    pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
    pe = positional_encoding(pts, mr)
    ve = positional_encoding(vd, mrv)
    veb = jnp.broadcast_to(ve[:, None, :], (N, S, ve.shape[-1]))
    params = model.init(jax.random.key(1), pe[:1, :1], veb[:1, :1])
    return model, params, (ro, rd, vd, z, pts, pe, veb)


@pytest.mark.parametrize("depth,skips", [(4, ()), (8, (4,))])
def test_q8_semantic_matches_flax_within_tolerance(depth, skips):
    """Quantized semantic serving forward: raw within the quantization band
    and ray-summed logits within its S-amplified version (the unweighted sum
    over S samples scales absolute error by ~S)."""
    from depth_lidar_nerf_tpu.ops.fused_mlp_t import (
        fused_nerf_apply_rays_semantic_q8)

    model, params, (ro, rd, vd, z, pts, pe, veb) = _setup_sem(depth=depth,
                                                              skips=skips)
    ref = np.asarray(model.apply(params, pe, veb))  # [N, S, 4 + C]
    sem_ray_ref = ref[..., 4:].astype(np.float64).sum(axis=1)
    raw, sem = fused_nerf_apply_rays_semantic_q8(
        params, ro, rd, vd, z, depth=depth, width=64, multires=10,
        multires_views=4, dtype=jnp.float32, skips=skips)
    err = np.abs(np.asarray(raw).transpose(1, 2, 0) - ref[..., :4])
    assert err.max() < 0.05, err.max()
    sem_err = np.abs(np.asarray(sem) - sem_ray_ref)
    S = z.shape[1]
    assert sem_err.max() < 0.05 * S, sem_err.max()


def test_render_int8_semantic_dispatch(monkeypatch):
    """render_int8 + semantic classes routes through apply_rays_semantic_q8
    (no acts byte cap: n_points=0) and matches the bf16 semantic render."""
    from depth_lidar_nerf_tpu.render.renderer import (
        RenderConfig, Rays, _composite_from_z)
    from depth_lidar_nerf_tpu.train.state import FusedMLP

    model, params, (ro, rd, vd, z, pts, pe, veb) = _setup_sem(N=16, skips=())
    rays = Rays(ro, rd, vd, jnp.full((16, 1), 2.0), jnp.full((16, 1), 6.0))
    fused = FusedMLP(model)
    # force the fused predicates on the CPU backend for this test
    fused.supports_raw_semantic = lambda p, c, n_points=0, S=0: True

    calls = {"q8": 0}
    orig = FusedMLP.apply_rays_semantic_q8

    def counting(self, *a, **k):
        calls["q8"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(FusedMLP, "apply_rays_semantic_q8", counting)

    base = dict(N_samples=128, N_importance=0, perturb=False,
                raw_noise_std=0.0, ndc=False, near=2.0, far=6.0,
                multires=10, multires_views=4, num_semantic_classes=4)
    out_q8 = _composite_from_z(fused, params, rays, z,
                               RenderConfig(**base, render_int8=True), None)
    assert calls["q8"] == 1
    out_bf = _composite_from_z(fused, params, rays, z,
                               RenderConfig(**base), None)
    assert calls["q8"] == 1
    np.testing.assert_allclose(np.asarray(out_q8.rgb),
                               np.asarray(out_bf.rgb), atol=0.03)
    np.testing.assert_allclose(np.asarray(out_q8.semantic),
                               np.asarray(out_bf.semantic), atol=0.05 * 128)


def test_patch_ng_int8_routes_only_the_no_grad_leg(monkeypatch, tmp_path):
    """--patch_ng_int8 (VERDICT r3 #4): the gradient-free patch render leg
    (step.py ng_render, reference run_nerf.py:1600-1644) dispatches to the
    W8A8 kernels while the grad leg and the base render stay bf16, and the
    step still optimizes (finite loss, step advances)."""
    import os

    from depth_lidar_nerf_tpu.data.synthetic import make_scene
    from depth_lidar_nerf_tpu.train.config import (TrainConfig,
                                                   render_config_from)
    from depth_lidar_nerf_tpu.train.loop import load_scene
    from depth_lidar_nerf_tpu.train.state import (FusedMLP, build_models,
                                                  init_train_state,
                                                  init_vgg_params)
    from depth_lidar_nerf_tpu.train.step import make_train_step
    from depth_lidar_nerf_tpu.train.tables import (build_depth_table,
                                                   build_rgb_table)

    monkeypatch.setenv("DLNERF_PALLAS_INTERPRET", "1")
    d = str(tmp_path / "scene")
    make_scene(d, n_images=2, H=24, W=32, focal=30.0, n_depth_points=60)
    cfg = TrainConfig(
        datadir=d, dataset_type="llff", factor=0, llffhold=0,
        test_scene=[-1], N_rand=64, N_samples=16, N_importance=16,
        netdepth=2, netwidth=128, netdepth_fine=2, netwidth_fine=128,
        use_viewdirs=True, no_ndc=True, multires=4, multires_views=2,
        feature_loss=True, feature_loss_type="vgg", vgg_layers=["conv1_2"],
        vgg_layer_weights=[1.0], vgg_loss_type="l1",
        nH=8, nW=16, gradH=4, gradW=4, patch_ng_int8=True,
        use_fused_mlp=True,
    )
    scene = load_scene(cfg)
    rcfg = render_config_from(cfg, 0, scene.near, scene.far)
    models = build_models(cfg, rcfg)
    state = init_train_state(cfg, rcfg, models, jax.random.key(0))
    vgg_p = init_vgg_params(cfg, models, jax.random.key(7))
    H, W, focal = scene.hwf
    rgb_t = build_rgb_table(scene.images, scene.poses, scene.i_train,
                            H, W, focal, rcfg)
    dep_t = None

    calls = {"q8": 0, "bf16": 0}
    orig_q8, orig_bf = FusedMLP.apply_rays_q8, FusedMLP.apply_rays

    def count_q8(self, *a, **k):
        calls["q8"] += 1
        return orig_q8(self, *a, **k)

    def count_bf(self, *a, **k):
        calls["bf16"] += 1
        return orig_bf(self, *a, **k)

    monkeypatch.setattr(FusedMLP, "apply_rays_q8", count_q8)
    monkeypatch.setattr(FusedMLP, "apply_rays", count_bf)

    step = make_train_step(cfg, rcfg, models, scene.hwf, feature_on=True)
    from depth_lidar_nerf_tpu.train.loop import _make_patch_batch

    patch = _make_patch_batch(cfg, scene, np.random.default_rng(0))
    st2, m = step(state, rgb_t, dep_t, patch, vgg_p, jax.random.key(3))
    assert calls["q8"] >= 1, calls  # the no-grad leg went int8
    assert calls["bf16"] >= 1, calls  # grad leg + base render stayed bf16
    assert np.isfinite(float(m["loss"]))
    assert int(st2.step) == 1

    # Flag off: no q8 dispatch anywhere in the same step variant.
    calls["q8"] = 0
    cfg_off = cfg.replace(patch_ng_int8=False)
    step_off = make_train_step(cfg_off, rcfg, models, scene.hwf,
                               feature_on=True)
    state2 = init_train_state(cfg_off, rcfg, models, jax.random.key(0))
    step_off(state2, rgb_t, dep_t, patch, vgg_p, jax.random.key(3))
    assert calls["q8"] == 0, calls
