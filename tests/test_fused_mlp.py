"""Fused Pallas MLP kernels vs the Flax module (interpreter mode, f32).

Runs the v3 (packed-lane) and v4 (transposed, in-kernel encoding) kernels
through the Pallas interpreter on the CPU backend and checks forward AND all
parameter gradients against the Flax reference to f32 precision. TPU-mode
numerics are spot-checked separately (bf16 rounding-path noise only —
PERF.md).
"""

import math

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


def _grad_compare(loss_ref, loss_fused, params, tol):
    g_r = jax.grad(loss_ref)(params)
    g_f = jax.grad(loss_fused)(params)
    for (path, a), b in zip(jax.tree_util.tree_flatten_with_path(g_r)[0],
                            jax.tree_util.tree_leaves(g_f)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        err = np.abs(a - b).max() / (np.abs(a).mean() + 1e-12)
        assert err < tol, (jax.tree_util.keystr(path), err)


def test_fused_v4_matches_flax_f32():
    from depth_lidar_nerf_tpu.ops.fused_mlp_t import fused_nerf_apply_rays

    model, params, (ro, rd, vd, z, pts, pe, veb) = _setup()
    kw = dict(depth=4, width=64, multires=10, multires_views=4,
              dtype=jnp.float32)
    ref = np.asarray(model.apply(params, pe, veb))
    got = np.asarray(fused_nerf_apply_rays(params, ro, rd, vd, z, **kw))
    # v4 returns channel-major [4, N, S]
    np.testing.assert_allclose(got.transpose(1, 2, 0), ref, rtol=1e-4,
                               atol=1e-4)

    _grad_compare(
        lambda p: jnp.mean(jnp.sin(model.apply(p, pe, veb)) ** 2),
        lambda p: jnp.mean(jnp.sin(
            fused_nerf_apply_rays(p, ro, rd, vd, z, **kw)) ** 2),
        params, tol=1e-3)


def test_fused_v4_ray_padding():
    """Ray counts that don't divide the tile get padded and sliced back."""
    from depth_lidar_nerf_tpu.ops.fused_mlp_t import fused_nerf_apply_rays

    model, params, (ro, rd, vd, z, pts, pe, veb) = _setup(N=5, S=128)
    got = fused_nerf_apply_rays(params, ro, rd, vd, z, depth=4, width=64,
                                multires=10, multires_views=4,
                                dtype=jnp.float32)
    assert got.shape == (4, 5, 128)
    ref = np.asarray(model.apply(params, pe, veb))
    np.testing.assert_allclose(np.asarray(got).transpose(1, 2, 0), ref,
                               rtol=1e-4, atol=1e-4)


def test_fused_v3_matches_flax_f32():
    from depth_lidar_nerf_tpu.ops.fused_mlp import fused_nerf_apply_raw

    model, params, (ro, rd, vd, z, pts, pe, veb) = _setup()
    got = np.asarray(fused_nerf_apply_raw(
        params, pts, vd, depth=4, width=64, multires=10, multires_views=4,
        dtype=jnp.float32))
    ref = np.asarray(model.apply(params, pe, veb))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    _grad_compare(
        lambda p: jnp.mean(jnp.sin(model.apply(p, pe, veb)) ** 2),
        lambda p: jnp.mean(jnp.sin(fused_nerf_apply_raw(
            p, pts, vd, depth=4, width=64, multires=10, multires_views=4,
            dtype=jnp.float32)) ** 2),
        params, tol=1e-3)


def test_fused_v4_culled_backward_matches_uncull():
    """Backward culling is exact: with per-ray zero-cotangent suffixes (what
    cull_eps-masked compositing produces), the culled backward's weight grads
    equal the dense backward's to f32 precision."""
    from depth_lidar_nerf_tpu.ops.fused_mlp_t import fused_nerf_apply_rays

    model, params, (ro, rd, vd, z, pts, pe, veb) = _setup(N=8, S=128)
    kw = dict(depth=4, width=64, multires=10, multires_views=4,
              dtype=jnp.float32)
    # per-ray live lengths: suffix cotangents must be exactly zero
    lengths = jnp.array([0, 16, 32, 48, 64, 96, 128, 128])
    mask = (jnp.arange(128)[None, :] < lengths[:, None]).astype(jnp.float32)

    def loss(p, cull):
        raw = fused_nerf_apply_rays(p, ro, rd, vd, z, cull_bwd=cull, **kw)
        return jnp.mean(jnp.sin(raw * mask[None]) ** 2 * mask[None])

    g_dense = jax.grad(lambda p: loss(p, False))(params)
    g_cull = jax.grad(lambda p: loss(p, True))(params)
    for (path, a), b in zip(jax.tree_util.tree_flatten_with_path(g_dense)[0],
                            jax.tree_util.tree_leaves(g_cull)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        err = np.abs(a - b).max() / (np.abs(a).mean() + 1e-12)
        assert err < 1e-4, (jax.tree_util.keystr(path), err)

    # and against the Flax reference too
    def loss_ref(p):
        return jnp.mean(
            jnp.sin(model.apply(p, pe, veb).transpose(2, 0, 1)
                    * mask[None]) ** 2 * mask[None])

    _grad_compare(loss_ref, lambda p: loss(p, True), params, tol=1e-3)


def test_composite_cull_eps_fused_matches_flax():
    """cull_eps-masked compositing + culled backward on the fused path
    reproduces the Flax path's loss gradients at FIXED sample positions.

    (render_rays-level equality through sample_pdf is only distributional:
    f32 reassociation shifts the resampled fine z's, legitimately changing
    gradients — so the comparison pins z.)
    """
    from depth_lidar_nerf_tpu.render.renderer import (
        RenderConfig, Rays, _composite_from_z)
    from depth_lidar_nerf_tpu.train.state import FusedMLP

    model, params, (ro, rd, vd, z, pts, pe, veb) = _setup(N=16)
    cfg = RenderConfig(N_samples=128, N_importance=0, perturb=False,
                       raw_noise_std=0.0, ndc=False, near=2.0, far=6.0,
                       multires=10, multires_views=4, cull_eps=1e-3)
    rays = Rays(ro, rd, vd, jnp.full((16, 1), 2.0), jnp.full((16, 1), 6.0))
    fused = FusedMLP(model)
    # force the fused path on CPU for this test
    fused.supports_raw = lambda p, c: True
    fused.supports_rays_path = lambda p, c: True

    def loss(p, m):
        out = _composite_from_z(m, p, rays, z, cfg, None)
        return (jnp.mean(out.rgb ** 2) + jnp.mean(out.depth ** 2)
                + jnp.mean(out.acc))

    l_ref, g_ref = jax.value_and_grad(lambda p: loss(p, model))(params)
    l_fused, g_fused = jax.value_and_grad(lambda p: loss(p, fused))(params)
    np.testing.assert_allclose(float(l_ref), float(l_fused), rtol=1e-4)
    # sanity: the cull mask actually bites at this eps
    out = _composite_from_z(model, params, rays, z, cfg, None)
    assert float((out.weights == 0.0).mean()) > 0.05
    for (path, a), b in zip(jax.tree_util.tree_flatten_with_path(g_ref)[0],
                            jax.tree_util.tree_leaves(g_fused)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        err = np.abs(a - b).max() / (np.abs(a).mean() + 1e-12)
        assert err < 1e-3, (jax.tree_util.keystr(path), err)


def test_fused_v4_skip_topology_matches_flax():
    """The reference's DEFAULT topology — netdepth=8, skip concat after layer
    4 (run_nerf_helpers.py:77-174, run_nerf.py:693) — on the v4 kernel:
    forward and all parameter grads (incl. the [e_p + W, W] skip-layer
    kernel) match Flax, on both the recompute and saved-acts backwards."""
    from depth_lidar_nerf_tpu.ops.fused_mlp_t import fused_nerf_apply_rays

    model, params, (ro, rd, vd, z, pts, pe, veb) = _setup(depth=8, width=64)
    assert model.skips == (4,)
    p = params["params"]
    assert p["trunk_5"]["kernel"].shape[0] == 63 + 64  # live skip concat
    kw = dict(depth=8, width=64, multires=10, multires_views=4,
              dtype=jnp.float32, skips=(4,))
    ref = np.asarray(model.apply(params, pe, veb))
    got = np.asarray(fused_nerf_apply_rays(params, ro, rd, vd, z, **kw))
    np.testing.assert_allclose(got.transpose(1, 2, 0), ref, rtol=1e-4,
                               atol=1e-4)

    for extra in (dict(), dict(save_acts=True)):
        _grad_compare(
            lambda p: jnp.mean(jnp.sin(model.apply(p, pe, veb)) ** 2),
            lambda p: jnp.mean(jnp.sin(
                fused_nerf_apply_rays(p, ro, rd, vd, z, **kw, **extra)) ** 2),
            params, tol=1e-3)


def test_fused_v4_skip_culled_backward_matches_flax():
    """Cotangent-culled backward at the skip topology (zero-suffix masks)."""
    from depth_lidar_nerf_tpu.ops.fused_mlp_t import fused_nerf_apply_rays

    model, params, (ro, rd, vd, z, pts, pe, veb) = _setup(depth=8, width=64,
                                                          N=8, S=128)
    kw = dict(depth=8, width=64, multires=10, multires_views=4,
              dtype=jnp.float32, skips=(4,))
    lengths = jnp.array([0, 16, 32, 48, 64, 96, 128, 128])
    mask = (jnp.arange(128)[None, :] < lengths[:, None]).astype(jnp.float32)

    def loss(p):
        raw = fused_nerf_apply_rays(p, ro, rd, vd, z, cull_bwd=True, **kw)
        return jnp.mean(jnp.sin(raw * mask[None]) ** 2 * mask[None])

    def loss_ref(p):
        return jnp.mean(
            jnp.sin(model.apply(p, pe, veb).transpose(2, 0, 1)
                    * mask[None]) ** 2 * mask[None])

    _grad_compare(loss_ref, loss, params, tol=1e-3)


def test_supports_rays_predicate_skip_topology():
    from depth_lidar_nerf_tpu.ops.fused_mlp_t import supports_rays

    model, params, _ = _setup(depth=8, width=128)
    assert supports_rays(params, True, 0, 8, 128, 10, 4, skips=(4,))
    # dead skip (reference shipped KITTI configs: netdepth=4, skips=(4,))
    m4, p4, _ = _setup(depth=4, width=128)
    assert supports_rays(p4, True, 0, 4, 128, 10, 4, skips=(4,))
    # skip at the last trunk layer would change the head input width
    assert not supports_rays(params, True, 0, 8, 128, 10, 4, skips=(7,))
    assert not supports_rays(params, True, 0, 9, 128, 10, 4, skips=(4,))
    # param shape mismatch (skips claim a concat the params don't have)
    assert not supports_rays(p4, True, 0, 4, 128, 10, 4, skips=(1,))


def test_supports_predicate():
    from depth_lidar_nerf_tpu.ops.fused_mlp import supports

    model, params, _ = _setup(depth=4, width=64)
    # width 64 is not a supported fused width
    assert not supports(params, True, 0, 4, 64, 128, 10, 4)
    model, params, _ = _setup(depth=4, width=128)
    assert supports(params, True, 0, 4, 128, 128, 10, 4)
    assert not supports(params, True, 0, 4, 128, 100, 10, 4)  # S !| tile
    assert not supports(params, False, 0, 4, 128, 128, 10, 4)  # no viewdirs
    assert not supports(params, True, 5, 4, 128, 128, 10, 4)  # semantic
    assert not supports(params, True, 0, 8, 128, 128, 10, 4)  # deep trunk


def _occluding_params(params, bias=30.0):
    """Raise the sigma head's bias so the field genuinely occludes (rays
    terminate mid-range), giving the cull paths something to skip."""
    import copy

    p = copy.deepcopy(jax.device_get(params))
    tree = p["params"] if "params" in p else p
    tree["sigma"]["bias"] = np.full_like(np.asarray(tree["sigma"]["bias"]),
                                         bias)
    return jax.tree.map(jnp.asarray, p)


@pytest.mark.parametrize("N", [256, 100])
def test_fused_fwd_cull_exact(N, monkeypatch):
    monkeypatch.setenv("DLNERF_CULL_FWD", "1")
    """Forward early termination is exact: composited outputs and gradients
    match the dense fused path under the same cull_eps compositing, for any
    sort key, with and without ray padding — while a real fraction of sample
    blocks is actually skipped (written as sigma=-1e10)."""
    from depth_lidar_nerf_tpu.ops.compositing import (composit_dists,
                                                      raw2outputs_t)
    from depth_lidar_nerf_tpu.ops.fused_mlp_t import fused_nerf_apply_rays

    model, params, (ro, rd, vd, z, *_rest) = _setup(N=N, S=64)
    params = _occluding_params(params)
    kw = dict(depth=4, width=64, multires=10, multires_views=4,
              dtype=jnp.float32)
    key_sort = jax.random.uniform(jax.random.key(7), (N,))  # scrambled order
    deltas = composit_dists(z, rd)
    noise = jax.random.normal(jax.random.key(8), (N, 64)) * 0.5
    eps = 1e-3

    def raw_of(p, fwd):
        fc = (key_sort, deltas, noise, eps) if fwd else None
        return fused_nerf_apply_rays(p, ro, rd, vd, z, cull_bwd=True,
                                     fwd_cull=fc, **kw)

    def outs(p, fwd):
        return raw2outputs_t(raw_of(p, fwd), z, rd, raw_noise_std=0.5,
                             cull_eps=eps, noise=noise)

    o_d, o_c = outs(params, False), outs(params, True)
    np.testing.assert_allclose(np.asarray(o_c.rgb), np.asarray(o_d.rgb),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_c.depth), np.asarray(o_d.depth),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_c.weights),
                               np.asarray(o_d.weights), atol=1e-5)

    if N % 128 == 0:
        # the cull must bite (occluded suffixes written as sigma=-1e10);
        # with padding the pad rays (T = 1 forever) keep their block live,
        # so the padded case only checks exactness.
        culled_frac = float(jnp.mean(raw_of(params, True)[3] < -1e9))
        assert culled_frac > 0.1, culled_frac

    def loss(p, fwd):
        o = outs(p, fwd)
        return jnp.mean(o.rgb ** 2) + jnp.mean(o.depth ** 2) + jnp.mean(o.acc)

    _grad_compare(lambda p: loss(p, False), lambda p: loss(p, True),
                  params, tol=1e-4)


def test_render_rays_fwd_cull_matches_flax(monkeypatch):
    monkeypatch.setenv("DLNERF_CULL_FWD", "1")
    """render_rays end-to-end with cull_eps (fwd+bwd culling active on the
    fused fine pass) matches the Flax path's maps on a fixed-z comparison."""
    from depth_lidar_nerf_tpu.render.renderer import (RenderConfig, Rays,
                                                      _composite_from_z)
    from depth_lidar_nerf_tpu.train.state import FusedMLP

    model, params, (ro, rd, vd, z, pts, pe, veb) = _setup(N=16)
    params = _occluding_params(params)
    cfg = RenderConfig(N_samples=128, N_importance=0, perturb=False,
                       raw_noise_std=0.0, ndc=False, near=2.0, far=6.0,
                       multires=10, multires_views=4, cull_eps=1e-3)
    rays = Rays(ro, rd, vd, jnp.full((16, 1), 2.0), jnp.full((16, 1), 6.0))
    fused = FusedMLP(model)
    fused.supports_raw = lambda p, c: True
    fused.supports_rays_path = lambda p, c: True
    key = jnp.linspace(0.0, 1.0, 16)[::-1]

    out_ref = _composite_from_z(model, params, rays, z, cfg, None)
    out_cf = _composite_from_z(fused, params, rays, z, cfg, None,
                               fwd_sort_key=key)
    np.testing.assert_allclose(np.asarray(out_cf.rgb),
                               np.asarray(out_ref.rgb), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_cf.depth),
                               np.asarray(out_ref.depth), rtol=1e-4,
                               atol=1e-5)


def test_fused_bwd_acts_matches_flax():
    """The saved-activation backward (no recompute) reproduces the Flax
    gradients; its primal path (used by eval renders) stays the plain dense
    forward."""
    from depth_lidar_nerf_tpu.ops.fused_mlp_t import fused_nerf_apply_rays

    model, params, (ro, rd, vd, z, pts, pe, veb) = _setup(N=8, S=128)
    kw = dict(depth=4, width=64, multires=10, multires_views=4,
              dtype=jnp.float32)
    ref = np.asarray(model.apply(params, pe, veb))
    got = np.asarray(fused_nerf_apply_rays(params, ro, rd, vd, z,
                                           save_acts=True, **kw))
    np.testing.assert_allclose(got.transpose(1, 2, 0), ref, rtol=1e-4,
                               atol=1e-4)

    _grad_compare(
        lambda p: jnp.mean(jnp.sin(model.apply(p, pe, veb)) ** 2),
        lambda p: jnp.mean(jnp.sin(fused_nerf_apply_rays(
            p, ro, rd, vd, z, save_acts=True, **kw)) ** 2),
        params, tol=1e-3)


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
def test_fused_semantic_matches_flax(depth, skips):
    """The semantic fast path (in-kernel head + in-kernel unweighted ray
    sum) matches the Flax module + XLA sum on outputs AND all gradients —
    including the semantic head's own params and the trunk gradient
    contribution that flows back through the head's feature cotangent.
    Covers the reference-DEFAULT fine topology netdepth_fine=8 / skip@4
    (run_nerf_helpers.py:77-174; fern_dsnerf.txt leaves netdepth_fine
    at its default) as well as the shipped-coarse netdepth=4."""
    from depth_lidar_nerf_tpu.ops.fused_mlp_t import (
        fused_nerf_apply_rays_semantic)

    model, params, (ro, rd, vd, z, pts, pe, veb) = _setup_sem(
        depth=depth, skips=skips)
    kw = dict(depth=depth, width=64, multires=10, multires_views=4,
              dtype=jnp.float32, skips=skips)
    ref = np.asarray(model.apply(params, pe, veb))  # [N, S, 4 + C]
    ref_map = ref[..., 4:].astype(np.float64).sum(axis=1)  # unweighted sum
    raw, sem = fused_nerf_apply_rays_semantic(params, ro, rd, vd, z, **kw)
    np.testing.assert_allclose(np.asarray(raw).transpose(1, 2, 0),
                               ref[..., :4], rtol=1e-4, atol=1e-4)
    assert sem.shape == ref_map.shape  # [N, C] ray-summed logits
    np.testing.assert_allclose(np.asarray(sem), ref_map, rtol=1e-4,
                               atol=1e-3)

    def loss_ref(p):
        out = model.apply(p, pe, veb)
        return (jnp.mean(jnp.sin(out[..., :4]) ** 2)
                + jnp.mean(jnp.sum(out[..., 4:], axis=1) ** 2))

    def loss_fused(p):
        raw, sem = fused_nerf_apply_rays_semantic(p, ro, rd, vd, z, **kw)
        return (jnp.mean(jnp.sin(raw.transpose(1, 2, 0)) ** 2)
                + jnp.mean(sem ** 2))

    _grad_compare(loss_ref, loss_fused, params, tol=1e-3)


def test_fused_semantic_mismatched_acts_tile(monkeypatch):
    """Equivalence at a tile mismatch: the acts-forward tile (48 rays) does
    not divide the dense-forward tile (64 rays), the configuration where
    max-padding (instead of LCM-padding) floor-dropped the tail rays from
    the acts grid and returned garbage raw/semantic values and gradients
    for them. Arises in production at D=5..6/f32/W=256 via the VMEM cap."""
    from depth_lidar_nerf_tpu.ops import fused_mlp_t
    from depth_lidar_nerf_tpu.ops.fused_mlp_t import (
        fused_nerf_apply_rays_semantic)

    monkeypatch.setattr(fused_mlp_t, "_ACTS_TILE_FWD", 6144)  # 48 rays @S=128
    assert fused_mlp_t._acts_tile_fwd(128, 4, 64, jnp.float32) == 6144
    model, params, (ro, rd, vd, z, pts, pe, veb) = _setup_sem(N=8)
    kw = dict(depth=4, width=64, multires=10, multires_views=4,
              dtype=jnp.float32, skips=(4,))
    ref = np.asarray(model.apply(params, pe, veb))
    raw, sem = fused_nerf_apply_rays_semantic(params, ro, rd, vd, z, **kw)
    np.testing.assert_allclose(np.asarray(raw).transpose(1, 2, 0),
                               ref[..., :4], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sem),
                               ref[..., 4:].astype(np.float64).sum(axis=1),
                               rtol=1e-4, atol=1e-3)

    def loss_ref(p):
        out = model.apply(p, pe, veb)
        return (jnp.mean(jnp.sin(out[..., :4]) ** 2)
                + jnp.mean(jnp.sum(out[..., 4:], axis=1) ** 2))

    def loss_fused(p):
        raw, sem = fused_nerf_apply_rays_semantic(p, ro, rd, vd, z, **kw)
        return (jnp.mean(jnp.sin(raw.transpose(1, 2, 0)) ** 2)
                + jnp.mean(sem ** 2))

    _grad_compare(loss_ref, loss_fused, params, tol=1e-3)


def test_composite_semantic_fused_matches_flax():
    """_composite_from_z dispatches semantic models to the fast path and the
    composited maps (incl. the unweighted semantic sum) match the Flax path."""
    from depth_lidar_nerf_tpu.render.renderer import (RenderConfig, Rays,
                                                      _composite_from_z)
    from depth_lidar_nerf_tpu.train.state import FusedMLP

    model, params, (ro, rd, vd, z, pts, pe, veb) = _setup_sem(width=128)
    cfg = RenderConfig(N_samples=128, N_importance=0, perturb=False,
                       raw_noise_std=0.0, ndc=False, near=2.0, far=6.0,
                       multires=10, multires_views=4, num_semantic_classes=4)
    rays = Rays(ro, rd, vd, jnp.full((8, 1), 2.0), jnp.full((8, 1), 6.0))
    fused = FusedMLP(model)
    fused.supports_raw_semantic = \
        lambda p, c, n_points=0, S=0: True  # CPU interpret override

    out_ref = _composite_from_z(model, params, rays, z, cfg, None)
    out_f = _composite_from_z(fused, params, rays, z, cfg, None)
    np.testing.assert_allclose(np.asarray(out_f.rgb),
                               np.asarray(out_ref.rgb), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_f.semantic),
                               np.asarray(out_ref.semantic), rtol=1e-4,
                               atol=1e-3)

    def loss(p, m):
        out = _composite_from_z(m, p, rays, z, cfg, None)
        return jnp.mean(out.rgb ** 2) + jnp.mean(out.semantic ** 2)

    _grad_compare(lambda p: loss(p, model), lambda p: loss(p, fused),
                  params, tol=1e-3)


def test_supports_semantic_predicate():
    from depth_lidar_nerf_tpu.ops.fused_mlp_t import supports_semantic

    _, params, _ = _setup_sem(width=128)
    assert supports_semantic(params, True, 4, 128, 10, 4)
    assert not supports_semantic(params, False, 4, 128, 10, 4)  # no viewdirs
    # depth-8 claim against depth-4 params: trunk_4.. missing -> False
    assert not supports_semantic(params, True, 8, 128, 10, 4)
    assert not supports_semantic(params, True, 4, 64, 10, 4)  # narrow width
    _, p_nosem, _ = _setup(width=128)
    assert not supports_semantic(p_nosem, True, 4, 128, 10, 4)  # no head
    # reference-default fine topology (netdepth_fine=8, skip@4): supported
    _, p8, _ = _setup_sem(depth=8, width=128, skips=(4,))
    assert supports_semantic(p8, True, 8, 128, 10, 4, skips=(4,))
    # skip feeding the heads (last trunk layer) is not implemented
    assert not supports_semantic(p8, True, 8, 128, 10, 4, skips=(7,))


def test_acts_tile_policy_vmem_aware():
    """Saved-acts tiles shrink for deep/f32 topologies so the kernels'
    double-buffered VMEM windows fit the chip (measured OOM: D=8/f32 at
    tile 8192 needs 163MB vs 128MB VMEM), and stay at their tuned sizes
    for the D=4 headline shapes."""
    from depth_lidar_nerf_tpu.ops.fused_mlp_t import (
        _acts_point_bytes, _acts_tile, _acts_tile_fwd, acts_points_cap)

    # Tuned D=4 shapes unchanged in both dtypes.
    assert _acts_tile_fwd(128, 4, 256, jnp.bfloat16) == 8192
    assert _acts_tile_fwd(128, 4, 256, jnp.float32) == 8192
    assert _acts_tile(128, 4, 256, jnp.float32) == 4096
    # The reference-default fine topology in f32 must shrink below 8192.
    assert _acts_tile_fwd(128, 8, 256, jnp.float32) < 8192
    # ... and the shrunken tile's windows fit a 128MB VMEM budget
    # double-buffered, with headroom for weights.
    t = _acts_tile_fwd(128, 8, 256, jnp.float32)
    assert 2 * t * _acts_point_bytes(8, 256, jnp.float32) <= 100 * 2**20
    # bf16 halves the window bytes: D=8 keeps the full tile.
    assert _acts_tile_fwd(128, 8, 256, jnp.bfloat16) == 8192
    # The HBM cap is byte-based: deeper trunks admit fewer points.
    assert acts_points_cap(8, 256) < acts_points_cap(4, 256)
    # ... and dtype-aware: f32 acts dumps cost 2x the bytes, so half the
    # points. Dtype-blind caps would admit 2x the HBM budget for f32 models.
    assert acts_points_cap(4, 256, jnp.float32) * 2 == acts_points_cap(
        4, 256, jnp.bfloat16)
    assert (acts_points_cap(8, 256, jnp.bfloat16) // 2
            == acts_points_cap(8, 256, jnp.float32))
    # documented 2816 B/point of saved acts + the [4] f32 raw window row
    assert _acts_point_bytes(4, 256, jnp.bfloat16) == 2816 + 16


def test_semantic_pad_covers_every_grid():
    """The semantic acts path pads rays once for THREE pallas grids (dense
    forward, acts forward, acts backward). Each grid floor-divides the
    point count by its own tile, so the pad unit must be the LCM of the
    rays-per-tile values — max-padding silently drops tail points whenever
    the VMEM-capped acts tile is not a divisor of the forward tile (e.g.
    6144 vs 8192 at D=5..6/f32, W=256)."""
    from depth_lidar_nerf_tpu.ops.fused_mlp_t import (
        _acts_tile, _acts_tile_fwd, _fwd_tile_size)

    S = 128
    hit_mismatch = False
    for depth in (4, 5, 6, 7, 8):
        for dtype in (jnp.bfloat16, jnp.float32):
            tile_f = _fwd_tile_size(S)
            t_a = _acts_tile_fwd(S, depth, 256, dtype)
            t_b = _acts_tile(S, depth, 256, dtype)
            rpt = math.lcm(tile_f // S, t_a // S, t_b // S)
            if t_a not in (tile_f, t_b) or tile_f % t_a or tile_f % t_b:
                hit_mismatch = True
            for N in (1024, 1000, 64):
                n_full = N + (-N) % rpt
                for t in (tile_f, t_a, t_b):
                    assert (n_full * S) % t == 0, (depth, dtype, N, t)
                    # max-padding is NOT sufficient in general; the LCM is.
    # The sweep must actually contain a tile-mismatch case, or it tests
    # nothing beyond the old max-padding.
    assert hit_mismatch


def test_acts_padding_helpers():
    """The shared pad-unit/padded-count helpers: plain forward-tile pad at
    the headline shape, LCM pad at the mismatch shapes, and the padded count
    is what the HBM cap must admit."""
    from depth_lidar_nerf_tpu.ops.fused_mlp_t import (
        _acts_pad_rays_per_tile, _acts_tile, _acts_tile_fwd, _fwd_tile_size,
        semantic_padded_rays)

    # Headline D=4/bf16: every tile divides the forward tile -> pad unit is
    # the forward tile's rays (no regression vs the old max-padding).
    assert _acts_pad_rays_per_tile(128, 4, 256, jnp.bfloat16) == \
        _fwd_tile_size(128) // 128
    # Mismatch shape: pad unit is the LCM over all three grids.
    rpt = _acts_pad_rays_per_tile(128, 5, 256, jnp.float32)
    for t in (_fwd_tile_size(128), _acts_tile_fwd(128, 5, 256, jnp.float32),
              _acts_tile(128, 5, 256, jnp.float32)):
        assert (rpt * 128) % t == 0
    # semantic_padded_rays rounds a batch up to that unit.
    assert semantic_padded_rays(1024, 128, 5, 256, jnp.float32) \
        == 1024 + (-1024) % rpt
    assert semantic_padded_rays(rpt, 128, 5, 256, jnp.float32) == rpt


@pytest.mark.parametrize("depth,skips,mr,mrv", [
    (5, (2,), 6, 2),
    (6, (1, 4), 10, 4),   # two live skips
    (7, (3,), 8, 3),
    (2, (), 4, 2),
])
def test_fused_v4_topology_sweep(depth, skips, mr, mrv):
    """Corner-topology sweep for the v4 rays kernel: odd depths, multiple
    live skips, non-default encodings — forward + grads vs Flax on both
    the recompute and saved-acts backwards. Guards the layer-loop
    generalizations (this round's LCM-padding bug hid at exactly such an
    untested D=5/6 corner)."""
    from depth_lidar_nerf_tpu.ops.fused_mlp_t import fused_nerf_apply_rays

    model, params, (ro, rd, vd, z, pts, pe, veb) = _setup(
        depth=depth, width=64, mr=mr, mrv=mrv)
    if skips != (4,):
        from depth_lidar_nerf_tpu.models import NeRFMLP
        from depth_lidar_nerf_tpu.ops.embedding import positional_encoding

        model = NeRFMLP(depth=depth, width=64, in_channels=3 + 6 * mr,
                        in_channels_views=3 + 6 * mrv, skips=skips,
                        dtype=jnp.float32)
        params = model.init(jax.random.key(1), pe[:1, :1], veb[:1, :1])
    kw = dict(depth=depth, width=64, multires=mr, multires_views=mrv,
              dtype=jnp.float32, skips=skips)
    ref = np.asarray(model.apply(params, pe, veb))
    got = np.asarray(fused_nerf_apply_rays(params, ro, rd, vd, z, **kw))
    np.testing.assert_allclose(got.transpose(1, 2, 0), ref, rtol=1e-4,
                               atol=1e-4)
    for extra in (dict(), dict(save_acts=True)):
        _grad_compare(
            lambda p: jnp.mean(jnp.sin(model.apply(p, pe, veb)) ** 2),
            lambda p: jnp.mean(jnp.sin(
                fused_nerf_apply_rays(p, ro, rd, vd, z, **kw, **extra)) ** 2),
            params, tol=1e-3)


@pytest.mark.parametrize("depth,skips", [(5, (2,)), (6, (1, 4))])
def test_fused_semantic_topology_sweep(depth, skips):
    """Same corner sweep for the semantic acts kernels."""
    from depth_lidar_nerf_tpu.ops.fused_mlp_t import (
        fused_nerf_apply_rays_semantic)

    model, params, (ro, rd, vd, z, pts, pe, veb) = _setup_sem(
        depth=depth, skips=skips)
    kw = dict(depth=depth, width=64, multires=10, multires_views=4,
              dtype=jnp.float32, skips=skips)
    ref = np.asarray(model.apply(params, pe, veb))
    raw, sem = fused_nerf_apply_rays_semantic(params, ro, rd, vd, z, **kw)
    np.testing.assert_allclose(np.asarray(raw).transpose(1, 2, 0),
                               ref[..., :4], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(sem), ref[..., 4:].astype(np.float64).sum(axis=1),
        rtol=1e-4, atol=1e-3)

    def loss_ref(p):
        out = model.apply(p, pe, veb)
        return (jnp.mean(jnp.sin(out[..., :4]) ** 2)
                + jnp.mean(jnp.sum(out[..., 4:], axis=1) ** 2))

    def loss_fused(p):
        raw, s = fused_nerf_apply_rays_semantic(p, ro, rd, vd, z, **kw)
        return (jnp.mean(jnp.sin(raw.transpose(1, 2, 0)) ** 2)
                + jnp.mean(s ** 2))

    _grad_compare(loss_ref, loss_fused, params, tol=1e-3)
