"""End-to-end training tests on a synthetic LLFF-format scene (CPU backend).

The integration tier of the test pyramid (SURVEY.md §4): the full driver —
loaders, ray tables, jitted step, losses, checkpointing — on a tiny analytic
scene, asserting PSNR climbs.
"""

import os

import numpy as np
import pytest

from depth_lidar_nerf_tpu.data.synthetic import make_scene
from depth_lidar_nerf_tpu.train.config import TrainConfig, parse_config_file
from depth_lidar_nerf_tpu.train.loop import load_scene, train


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    make_scene(str(d), n_images=3, H=24, W=32, focal=30.0, n_depth_points=120)
    return str(d)


def _tiny_cfg(scene_dir, tmp_path, **kw):
    base = dict(
        expname="t", basedir=str(tmp_path), datadir=scene_dir,
        dataset_type="llff", factor=0, llffhold=0, test_scene=[2],
        N_rand=96, N_samples=12, N_importance=8, netdepth=2, netwidth=48,
        netdepth_fine=2, netwidth_fine=48, use_viewdirs=True, no_ndc=True,
        N_iters=60, i_print=30, i_weights=60, i_testset=0, i_video=0,
        lrate=5e-3, multires=6, multires_views=2, should_seed=True,
        # Keep CPU test compiles cheap: K-step dispatch batching has its own
        # dedicated tests (test_k_step_*).
        steps_per_dispatch=1,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_load_scene_shapes(scene_dir, tmp_path):
    cfg = _tiny_cfg(scene_dir, tmp_path, colmap_depth=True, semantic_loss=True)
    scene = load_scene(cfg)
    assert scene.images.shape == (3, 24, 32, 3)
    assert scene.poses.shape == (3, 3, 4)
    assert len(scene.depth_gts) == 3
    assert scene.segmentation.shape == (3, 24, 32)
    assert scene.num_semantic_classes == 4
    assert list(scene.i_test) == [2]
    assert sorted(scene.i_train) == [0, 1]
    # depth annotations must lie within [near, far]
    for d in scene.depth_gts:
        assert (d["depth"] > scene.near - 1e-5).all()
        assert (d["depth"] < scene.far + 1e-5).all()


def test_train_rgb_only_psnr_climbs(scene_dir, tmp_path, capsys):
    cfg = _tiny_cfg(scene_dir, tmp_path, N_iters=200, i_print=20, i_weights=200)
    state = train(cfg)
    outp = capsys.readouterr().out
    lines = [l for l in outp.splitlines() if l.startswith("[TRAIN]")]
    first = float(lines[0].split("psnr")[1].split()[0])
    last = float(lines[-1].split("psnr")[1].split()[0])
    assert last > first + 2.0, outp
    assert last > 18.0, outp
    assert int(state.step) == 200


def test_k_step_batching_matches_unbatched(scene_dir, tmp_path):
    """steps_per_dispatch>1 (lax.scan K steps per dispatch) must reproduce
    the unbatched trajectory: RNG folds per inner step with the global
    iteration index, so parameters match at float tolerance."""
    import jax

    cfg1 = _tiny_cfg(scene_dir, tmp_path / "a", N_iters=24, i_weights=24,
                     i_print=24, colmap_depth=True, depth_loss=True,
                     steps_per_dispatch=1)
    s1 = train(cfg1)
    cfgk = _tiny_cfg(scene_dir, tmp_path / "b", N_iters=24, i_weights=24,
                     i_print=24, colmap_depth=True, depth_loss=True,
                     steps_per_dispatch=8)
    sk = train(cfgk)
    assert int(s1.step) == int(sk.step) == 24
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(sk.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_k_step_blocks_respect_patch_schedule(scene_dir, tmp_path):
    """Blocks must not cross a loss-variant switch: a feature-loss-every-5
    run with batching on still executes its patch iterations."""
    cfg = _tiny_cfg(
        scene_dir, tmp_path, N_iters=20, i_weights=20, i_print=20,
        feature_loss=True, feature_start_iteration=1, feature_loss_every_n=5,
        vgg_layers=["conv1_2"], vgg_layer_weights=[1.0], vgg_loss_type="l1",
        nH=12, nW=16, gradH=4, gradW=4, steps_per_dispatch=0,
    )
    state = train(cfg)
    assert int(state.step) == 20


def test_train_with_depth_and_semantic(scene_dir, tmp_path):
    cfg = _tiny_cfg(
        scene_dir, tmp_path, colmap_depth=True, depth_loss=True,
        depth_lambda=0.05, semantic_loss=True, semantic_lambda=0.01,
        N_iters=40, i_weights=40,
    )
    state = train(cfg)
    assert int(state.step) == 40


def test_checkpoint_resume(scene_dir, tmp_path):
    cfg = _tiny_cfg(scene_dir, tmp_path, N_iters=30, i_weights=30)
    train(cfg)
    cfg2 = cfg.replace(N_iters=45)
    state = train(cfg2)
    assert int(state.step) == 45
    ckpts = os.listdir(os.path.join(str(tmp_path), "t", "checkpoints"))
    assert any("45" in c for c in ckpts)


def test_render_only(scene_dir, tmp_path):
    cfg = _tiny_cfg(scene_dir, tmp_path, N_iters=10, i_weights=10)
    train(cfg)
    cfg2 = cfg.replace(render_only=True, render_test=True)
    train(cfg2)
    outdir = os.path.join(str(tmp_path), "t", "renderonly_test_000010")
    files = os.listdir(outdir)
    assert "000.png" in files and "000.npz" in files


def test_render_only_with_density_grid(scene_dir, tmp_path):
    """--render_grid serving: bakes once, renders through the grid coarse
    pass, and the frames stay close to the full two-MLP render."""
    import imageio.v2 as imageio

    import shutil

    cfg = _tiny_cfg(scene_dir, tmp_path, N_iters=30, i_weights=30)
    train(cfg)
    outdir = os.path.join(str(tmp_path), "t", "renderonly_test_000030")

    train(cfg.replace(render_only=True, render_test=True, render_grid=48))
    grid = imageio.imread(os.path.join(outdir, "000.png")).astype(
        np.float32) / 255.0

    # full render of the same checkpoint into a fresh basedir
    cfg_b = cfg.replace(basedir=str(tmp_path) + "_b")
    shutil.copytree(os.path.join(str(tmp_path), "t", "checkpoints"),
                    os.path.join(str(tmp_path) + "_b", "t", "checkpoints"))
    train(cfg_b.replace(render_only=True, render_test=True))
    full = imageio.imread(os.path.join(
        str(tmp_path) + "_b", "t", "renderonly_test_000030",
        "000.png")).astype(np.float32) / 255.0
    mse = float(np.mean((grid - full) ** 2))
    assert -10 * np.log10(mse + 1e-12) > 35.0  # grid render ~= full render


def test_config_file_roundtrip(tmp_path):
    p = tmp_path / "cfg.txt"
    p.write_text(
        "expname = exp1\nN_rand = 1024\nfactor=4\nno_ndc = False\n"
        "colmap_depth = True\ndepth_lambda = 0.01\n"
        "vgg_layers = [conv1_2, conv2_2, conv3_4]\n"
        "vgg_layer_weights = [0.1, 0.1, 1]\n"
        "train_scene = [0,1,2,3]\nraw_noise_std = 1e0\n"
    )
    vals = parse_config_file(str(p))
    assert vals["expname"] == "exp1"
    assert vals["N_rand"] == 1024
    assert vals["no_ndc"] is False
    assert vals["colmap_depth"] is True
    assert vals["vgg_layers"] == ["conv1_2", "conv2_2", "conv3_4"]
    assert vals["vgg_layer_weights"] == [0.1, 0.1, 1.0]
    assert vals["train_scene"] == [0, 1, 2, 3]
    assert vals["raw_noise_std"] == 1.0


def test_patch_losses_train(scene_dir, tmp_path):
    cfg = _tiny_cfg(
        scene_dir, tmp_path, N_iters=12, i_weights=12,
        feature_loss=True, feature_start_iteration=1, feature_loss_every_n=5,
        vgg_layers=["conv1_2"], vgg_layer_weights=[1.0], vgg_loss_type="l1",
        gan_loss=True, gan_start_iteration=6,
        depth_inverse_loss=True, depth_inverse_loss_every_n=5,
        nH=12, nW=16, gradH=4, gradW=4,
    )
    state = train(cfg)
    assert int(state.step) == 12


def test_no_batching_precrop(scene_dir, tmp_path):
    cfg = _tiny_cfg(scene_dir, tmp_path, no_batching=True, precrop_iters=10,
                    precrop_frac=0.5, N_iters=20, i_weights=20)
    state = train(cfg)
    assert int(state.step) == 20


@pytest.fixture(scope="module")
def scene_dir_big(tmp_path_factory):
    """LPIPS(alex) needs >=31-px patches, so a taller scene."""
    d = tmp_path_factory.mktemp("scene_big")
    make_scene(str(d), n_images=3, H=36, W=40, focal=36.0, n_depth_points=120)
    return str(d)


@pytest.mark.parametrize("backbone", ["alex", "vgg", "squeeze"])
def test_lpips_feature_loss_train(scene_dir_big, tmp_path, backbone):
    """--feature_loss_type lpips as the train-time patch loss, with spatial
    map logging, over all three reference backbones (run_nerf.py:1240-1246,
    1242 net=alex|vgg|squeeze, 1708-1721)."""
    cfg = _tiny_cfg(
        scene_dir_big, tmp_path, N_iters=10, i_weights=10, i_print=5,
        feature_loss=True, feature_start_iteration=1, feature_loss_every_n=5,
        feature_loss_type="lpips", lpips_spatial=True,
        lpips_backbone=backbone,
        nH=32, nW=32, gradH=4, gradW=4,
    )
    state = train(cfg)
    assert int(state.step) == 10


def test_lpips_unknown_backbone_rejected(scene_dir_big, tmp_path):
    """An unknown lpips backbone must be rejected with a clear message, not
    fail deep in model build (run_nerf.py:1242 accepts alex|vgg|squeeze —
    all three ship here)."""
    cfg = _tiny_cfg(scene_dir_big, tmp_path, feature_loss=True,
                    feature_loss_type="lpips", lpips_backbone="resnet",
                    nH=32, nW=32, gradH=4, gradW=4)
    with pytest.raises(ValueError, match="resnet"):
        train(cfg)


def test_lpips_feature_loss_has_gradient(scene_dir_big, tmp_path):
    """The LPIPS patch loss must actually reach the NeRF params."""
    import jax

    from depth_lidar_nerf_tpu.train.config import render_config_from
    from depth_lidar_nerf_tpu.train.loop import _make_patch_batch, load_scene
    from depth_lidar_nerf_tpu.train.state import (
        build_models, init_train_state, init_vgg_params)
    from depth_lidar_nerf_tpu.train.step import make_train_step
    from depth_lidar_nerf_tpu.train.tables import build_rgb_table

    cfg = _tiny_cfg(scene_dir_big, tmp_path, feature_loss=True,
                    feature_loss_type="lpips", nH=32, nW=32, gradH=4, gradW=4)
    scene = load_scene(cfg)
    H, W, focal = scene.hwf
    rcfg = render_config_from(cfg, 0, scene.near, scene.far)
    models = build_models(cfg, rcfg)
    state = init_train_state(cfg, rcfg, models, jax.random.key(0))
    lp = init_vgg_params(cfg, models, jax.random.key(1))
    assert lp is not None
    tbl = build_rgb_table(scene.images, scene.poses, scene.i_train, H, W,
                          focal, rcfg)
    step = make_train_step(cfg, rcfg, models, scene.hwf, feature_on=True)
    patch = _make_patch_batch(cfg, scene, np.random.default_rng(0))
    # snapshot before the step: the step donates its input state
    p0 = jax.tree.map(lambda x: np.array(x), state.params)
    state, metrics = step(state, tbl, None, patch, lp, jax.random.key(2))
    assert float(metrics["feature_loss"]) > 0.0
    # params moved
    d = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(abs(a - np.asarray(b)).sum()),
                     p0, state.params))
    assert d > 0.0


def test_init_vgg_params_lpips_keeps_backbone_signs(scene_dir_big, tmp_path):
    """Random-init LPIPS params: only the lin heads are forced non-negative.
    A whole-tree abs would sign-strip the backbone conv weights, putting the
    train-time feature loss in a different metric space from the test-time
    metric (init_lpips) seeded identically."""
    import jax

    from depth_lidar_nerf_tpu.train.config import render_config_from
    from depth_lidar_nerf_tpu.train.loop import load_scene
    from depth_lidar_nerf_tpu.train.state import build_models, init_vgg_params

    cfg = _tiny_cfg(scene_dir_big, tmp_path, feature_loss=True,
                    feature_loss_type="lpips", nH=32, nW=32, gradH=4, gradW=4)
    scene = load_scene(cfg)
    rcfg = render_config_from(cfg, 0, scene.near, scene.far)
    models = build_models(cfg, rcfg)
    lp = init_vgg_params(cfg, models, jax.random.key(1))
    p = lp["params"]
    conv1 = np.asarray(p["backbone"]["conv1"]["kernel"])
    assert (conv1 < 0).any(), "backbone conv signs must be preserved"
    for name, tree in p.items():
        if name.startswith("lin_"):
            assert (np.asarray(tree["kernel"]) >= 0).all(), name


def test_sample_patch_in_jit(scene_dir_big, tmp_path):
    """In-jit patch sampling (step.sample_patch) must draw a valid crop:
    gt equals the image slice at the drawn origin, perm is a permutation,
    and the pose belongs to the drawn image. Matches the reference's host
    np.random picks (run_nerf.py:1557-1568) distributionally."""
    import jax
    import jax.numpy as jnp

    from depth_lidar_nerf_tpu.train.step import PatchSource, sample_patch

    cfg = _tiny_cfg(scene_dir_big, tmp_path)
    scene = load_scene(cfg)
    src = PatchSource(jnp.asarray(scene.images[scene.i_train], jnp.float32),
                      jnp.asarray(scene.poses[scene.i_train], jnp.float32))
    nH, nW = 16, 24
    seen_origins = set()
    for seed in range(6):
        patch = jax.jit(sample_patch, static_argnums=(2, 3))(
            src, jax.random.key(seed), nH, nW)
        assert patch.gt_patch.shape == (nH, nW, 3)
        perm = np.sort(np.asarray(patch.perm))
        assert (perm == np.arange(nH * nW)).all()
        sh, sw = int(patch.start_h), int(patch.start_w)
        seen_origins.add((sh, sw))
        # the gt crop must be an exact slice of exactly one train image,
        # and the pose must be that image's pose
        imgs = np.asarray(src.images)
        match = [i for i in range(imgs.shape[0])
                 if np.array_equal(imgs[i, sh:sh + nH, sw:sw + nW],
                                   np.asarray(patch.gt_patch))]
        assert len(match) >= 1
        assert any(np.array_equal(np.asarray(src.poses[i]),
                                  np.asarray(patch.c2w)) for i in match)
    assert len(seen_origins) > 1  # the crop origin actually varies


def test_patch_step_accepts_patch_source(scene_dir_big, tmp_path):
    """A patch step handed a PatchSource (device-resident images+poses)
    must sample in-jit and still deliver gradients — the path train() now
    uses for every patch iteration (no per-iter host uploads)."""
    import jax
    import jax.numpy as jnp

    from depth_lidar_nerf_tpu.train.config import render_config_from
    from depth_lidar_nerf_tpu.train.state import (
        build_models, init_train_state, init_vgg_params)
    from depth_lidar_nerf_tpu.train.step import PatchSource, make_train_step
    from depth_lidar_nerf_tpu.train.tables import build_rgb_table

    cfg = _tiny_cfg(scene_dir_big, tmp_path, feature_loss=True,
                    vgg_layers=["conv1_2"], vgg_layer_weights=[1.0],
                    vgg_loss_type="l1",
                    nH=32, nW=32, gradH=4, gradW=4, depth_inverse_loss=True)
    scene = load_scene(cfg)
    H, W, focal = scene.hwf
    rcfg = render_config_from(cfg, 0, scene.near, scene.far)
    models = build_models(cfg, rcfg)
    state = init_train_state(cfg, rcfg, models, jax.random.key(0))
    vgg = init_vgg_params(cfg, models, jax.random.key(1))
    tbl = build_rgb_table(scene.images, scene.poses, scene.i_train, H, W,
                          focal, rcfg)
    step = make_train_step(cfg, rcfg, models, scene.hwf, feature_on=True,
                           smooth_on=True)
    src = PatchSource(jnp.asarray(scene.images[scene.i_train], jnp.float32),
                      jnp.asarray(scene.poses[scene.i_train], jnp.float32))
    p0 = jax.tree.map(lambda x: np.array(x), state.params)
    state, metrics = step(state, tbl, None, src, vgg, jax.random.key(2))
    assert float(metrics["feature_loss"]) > 0.0
    assert np.isfinite(float(metrics["loss"]))
    d = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(abs(a - np.asarray(b)).sum()),
                     p0, state.params))
    assert d > 0.0


def test_ft_path_and_no_reload_optimizer(scene_dir, tmp_path):
    """--ft_path pins a checkpoint; --no_reload_optimizer keeps Adam fresh
    (run_nerf.py:449-477, 462)."""
    import glob

    import jax
    import numpy as np_

    cfg = _tiny_cfg(scene_dir, tmp_path, N_iters=20, i_weights=10,
                    expname="src")
    train(cfg)
    ckpts = sorted(glob.glob(os.path.join(str(tmp_path), "src", "checkpoints",
                                          "*")))
    ckpt10 = [c for c in ckpts if os.path.basename(c) == "10"][0]

    # ft_path resumes from step 10 even though step-20 exists.
    cfg2 = _tiny_cfg(scene_dir, tmp_path, N_iters=25, i_weights=25,
                     expname="ft", ft_path=ckpt10)
    state = train(cfg2)
    assert int(state.step) == 25

    # no_reload_optimizer: Adam moments start at zero after restore.
    cfg3 = _tiny_cfg(scene_dir, tmp_path, N_iters=11, i_weights=11,
                     expname="ft2", ft_path=ckpt10, no_reload_optimizer=True)
    from depth_lidar_nerf_tpu.train.checkpoint import (
        make_manager, restore_from_path)
    from depth_lidar_nerf_tpu.train.config import render_config_from
    from depth_lidar_nerf_tpu.train.state import build_models, init_train_state

    rcfg = render_config_from(cfg3, 0, 2.0, 6.0)
    models = build_models(cfg3, rcfg)
    template = init_train_state(cfg3, rcfg, models, jax.random.key(0))
    restored = restore_from_path(ckpt10, template)
    mu_norm = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda x: float(np_.abs(x).sum()), restored.opt_state[0].mu))
    assert mu_norm > 0.0  # the checkpoint really carries optimizer state


def test_depth_with_rgb_rejected(scene_dir, tmp_path):
    cfg = _tiny_cfg(scene_dir, tmp_path, colmap_depth=True, depth_loss=True,
                    depth_with_rgb=True)
    with pytest.raises(ValueError, match="depth_with_rgb"):
        train(cfg)


def test_vestigial_flags_warn(scene_dir, tmp_path, capsys):
    cfg = _tiny_cfg(scene_dir, tmp_path, N_iters=1, i_weights=1, testskip=4,
                    half_res=True)
    train(cfg)
    out = capsys.readouterr().out
    assert "testskip" in out and "half_res" in out and "vestigial" in out


def test_chunk_flag_controls_render_tile():
    from depth_lidar_nerf_tpu.render import RenderConfig

    rc = RenderConfig(N_samples=64, N_importance=64, chunk=8192)
    assert rc.render_tile() == 8192
    # lowering netchunk caps the tile by points-per-apply
    rc2 = RenderConfig(N_samples=64, N_importance=64, chunk=32768,
                       netchunk=16384)
    assert rc2.render_tile() == 16384 // 128
    # defaults unchanged
    assert RenderConfig().render_tile() == 32768
    # on a fully-fused render netchunk is vacuous (activations stream
    # through VMEM, never HBM) and only chunk binds
    assert rc2.render_tile(fused=True) == 32768


def test_fused_eval_ready_predicate():
    """fused_eval_ready mirrors _composite_from_z's dispatch (netchunk is
    only ignored when every pass really takes a fused kernel path)."""
    from depth_lidar_nerf_tpu.render import RenderConfig
    from depth_lidar_nerf_tpu.render.renderer import fused_eval_ready

    class _FusedModel:
        def __init__(self, ok=True):
            self._ok = ok

        def rays_ok(self, n):
            return True

        def supports_raw(self, params, cfg):
            return self._ok

        def supports_rays_path(self, params, cfg):
            return self._ok

        def apply_rays(self, *a, **k):
            raise AssertionError("predicate only")

    rc = RenderConfig(N_samples=64, N_importance=64, netchunk=16384)
    params = {"coarse": {}, "fine": {}}
    assert fused_eval_ready(_FusedModel(True), _FusedModel(True),
                            params, rc, 16384)
    # any pass falling back to Flax keeps the conservative tile policy
    assert not fused_eval_ready(_FusedModel(True), _FusedModel(False),
                                params, rc, 16384)
    assert not fused_eval_ready(_FusedModel(False), _FusedModel(True),
                                params, rc, 16384)
    # a bare Flax module (no fused entry points) is never "ready"
    class _Flax:
        pass

    assert not fused_eval_ready(_Flax(), _Flax(), params, rc, 16384)
    # S not tiling the kernel tile disqualifies the shape outright
    rc_odd = RenderConfig(N_samples=63, N_importance=0, netchunk=16384)
    assert not fused_eval_ready(_FusedModel(True), None, params, rc_odd, 16384)


def test_pick_render_tile_reevaluates_at_clamped_tile():
    """The tile policy must judge fused-readiness at the ACTUAL tile: a ray
    count below chunk clamps the tile, and a clamped tile that fails a
    per-tile dispatch check (e.g. mesh divisibility via rays_ok) renders on
    the Flax path — which must then get the netchunk-honoring tile, not the
    fused (un-throttled) one."""
    from depth_lidar_nerf_tpu.render import RenderConfig
    from depth_lidar_nerf_tpu.render.renderer import pick_render_tile

    class _MeshFusedModel:
        """Fused model on an 8-way mesh: per-tile dispatch needs 8 | rays."""

        def rays_ok(self, n):
            return n % 8 == 0

        def supports_raw(self, params, cfg):
            return True

        supports_rays_path = supports_raw

        def apply_rays(self, *a, **k):
            raise AssertionError("policy only")

    rc = RenderConfig(N_samples=64, N_importance=64, chunk=32768,
                      netchunk=16384)
    m = _MeshFusedModel()
    params = {"coarse": {}, "fine": {}}
    # 8-divisible render below chunk: fused at the clamped tile.
    assert pick_render_tile(m, m, params, rc, 16384) == 16384
    # 101x101 image (10201 rays): the clamped tile fails rays_ok, so the
    # policy falls back to the netchunk-honoring (Flax-safe) tile.
    assert pick_render_tile(m, m, params, rc, 10201) == rc.render_tile()
    assert pick_render_tile(m, m, params, rc, 10201) < 10201
    # Large renders tile at the fused chunk as before.
    assert pick_render_tile(m, m, params, rc, 500_000) == 32768


def test_eval_metrics_cli(scene_dir, tmp_path, capsys):
    import shutil
    from depth_lidar_nerf_tpu.evaluation.eval_metrics import main as eval_main

    gen = tmp_path / "gen"; gt = tmp_path / "gt"
    gen.mkdir(); gt.mkdir()
    import imageio.v2 as imageio
    rng = np.random.default_rng(0)
    for i in range(2):
        img = (rng.uniform(0, 1, (16, 20, 3)) * 255).astype(np.uint8)
        imageio.imwrite(gt / f"{i}.png", img)
        noisy = np.clip(img.astype(int) + rng.integers(-10, 10, img.shape), 0, 255)
        imageio.imwrite(gen / f"{i}.png", noisy.astype(np.uint8))
    eval_main(["--generated_dir", str(gen), "--gt_dir", str(gt), "--no_lpips"])
    out = capsys.readouterr().out
    assert "mean psnr" in out and "mean ssim" in out


def test_lpips_metric_properties():
    import jax
    from depth_lidar_nerf_tpu.models.lpips import init_lpips

    model, params = init_lpips(jax.random.key(0), H=32, W=32)
    a = jax.random.uniform(jax.random.key(1), (1, 32, 32, 3))
    b = jax.random.uniform(jax.random.key(2), (1, 32, 32, 3))
    d_ab = float(model.apply(params, a, b)[0])
    d_aa = float(model.apply(params, a, a)[0])
    assert d_aa < 1e-6
    assert d_ab > d_aa
    # symmetry
    d_ba = float(model.apply(params, b, a)[0])
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-5)


def test_html_report(tmp_path):
    from depth_lidar_nerf_tpu.utils.html_report import report_from_renders
    import imageio.v2 as imageio

    d = tmp_path / "renders"; d.mkdir()
    img = np.zeros((8, 8, 3), np.uint8)
    imageio.imwrite(d / "000.png", img)
    imageio.imwrite(d / "000_depth.png", img)
    path = report_from_renders(str(d), metrics=[{"file": "000.png", "psnr": 30.0}])
    text = open(path).read()
    assert "000.png" in text and "psnr" in text


def test_camera_viz_exports(tmp_path):
    from depth_lidar_nerf_tpu.utils.camera_viz import (
        export_camera_frustums, export_depth_rays, plot_poses_matplotlib)

    poses = np.stack([np.eye(4)[:3]] * 3)
    p1 = export_camera_frustums(poses, str(tmp_path / "frusta.ply"))
    assert open(p1).read().startswith("ply")
    ro = np.zeros((5, 3)); rd = np.tile([0, 0, -1.0], (5, 1)); dep = np.ones(5)
    p2 = export_depth_rays(ro, rd, dep, str(tmp_path / "rays.ply"))
    assert "element edge 5" in open(p2).read()
    p3 = plot_poses_matplotlib(poses, str(tmp_path / "poses.png"))
    assert os.path.exists(p3)


def test_frozen_alpha_model_path(scene_dir, tmp_path):
    """NeRF_RGB path: train, checkpoint, then fine-tune color with the frozen
    density from the checkpoint (run_nerf.py:400-431)."""
    import glob

    cfg = _tiny_cfg(scene_dir, tmp_path, N_iters=20, i_weights=20,
                    expname="alpha_src")
    train(cfg)
    ckpt_dirs = sorted(glob.glob(os.path.join(
        str(tmp_path), "alpha_src", "checkpoints", "*")))
    assert ckpt_dirs

    cfg2 = _tiny_cfg(scene_dir, tmp_path, N_iters=10, i_weights=10,
                     expname="alpha_ft", alpha_model_path=ckpt_dirs[-1])
    state = train(cfg2)
    assert int(state.step) == 10


def test_frozen_alpha_density_is_frozen(scene_dir, tmp_path):
    """Gradients must not flow into the density head under FrozenAlphaMLP."""
    import jax
    import jax.numpy as jnp

    from depth_lidar_nerf_tpu.models import NeRFMLP
    from depth_lidar_nerf_tpu.train.state import FrozenAlphaMLP

    m = NeRFMLP(depth=2, width=32, in_channels=9, in_channels_views=6)
    pe, ve = jnp.zeros((4, 9)), jnp.zeros((4, 6))
    alpha_params = m.init(jax.random.key(0), pe, ve)
    wrapper = FrozenAlphaMLP(m, m, alpha_params)
    params = m.init(jax.random.key(1), pe, ve)

    def loss(p):
        out = wrapper.apply(p, jnp.ones((4, 9)), jnp.ones((4, 6)))
        return jnp.mean(out[..., 3] ** 2) + jnp.mean(out[..., :3] ** 2)

    g = jax.grad(loss)(params)
    # sigma head of the TRAINED params receives no gradient (alpha substituted)
    assert float(jnp.abs(g["params"]["sigma"]["kernel"]).sum()) == 0.0
    # but the color branch does
    assert float(jnp.abs(g["params"]["rgb"]["kernel"]).sum()) > 0.0


def test_train_ndc_with_ndc_depth(scene_dir, tmp_path, capsys):
    """Forward-facing NDC training with NDC-transformed LiDAR depth
    (the fern/KITTI default path: no_ndc=False, depth d -> 1 - 1/d,
    load_llff.py:521)."""
    cfg = _tiny_cfg(scene_dir, tmp_path, no_ndc=False, colmap_depth=True,
                    depth_loss=True, depth_lambda=0.01,
                    N_iters=150, i_print=50, i_weights=150, expname="ndc")
    state = train(cfg)
    outp = capsys.readouterr().out
    lines = [l for l in outp.splitlines() if l.startswith("[TRAIN]")]
    first = float(lines[0].split("psnr")[1].split()[0])
    last = float(lines[-1].split("psnr")[1].split()[0])
    assert np.isfinite(last), outp
    assert last > first, outp
    # NDC depth supervision targets live in [0, 1): check the loaded tables
    from depth_lidar_nerf_tpu.train.loop import load_scene

    scene = load_scene(cfg)
    for d in scene.depth_gts:
        assert (d["depth"] < 1.0 + 1e-5).all()
    assert int(state.step) == 150


def test_reference_configs_parse():
    """Drop-in compatibility: the reference's own config files parse into a
    valid TrainConfig (if the reference checkout is mounted)."""
    import glob

    paths = sorted(glob.glob("/root/reference/configs/*.txt"))
    if not paths:
        pytest.skip("reference checkout not mounted")
    from depth_lidar_nerf_tpu.train.config import parse_config_file

    for path in paths:
        vals = parse_config_file(path)
        cfg = TrainConfig(**vals)
        assert cfg.dataset_type == "llff"
        assert cfg.N_rand > 0 and cfg.N_samples > 0


def test_repo_configs_parse():
    """Every config shipped in configs/ parses into a valid TrainConfig, and
    the drop-in fern_dsnerf.txt matches the reference's flag-for-flag."""
    import glob

    from depth_lidar_nerf_tpu.train.config import parse_config_file

    repo_configs = sorted(glob.glob("configs/*.txt"))
    assert repo_configs, "configs/ directory is empty"
    for path in repo_configs:
        TrainConfig(**parse_config_file(path))

    ref = "/root/reference/configs/fern_dsnerf.txt"
    if os.path.exists(ref):
        assert (parse_config_file("configs/fern_dsnerf.txt")
                == parse_config_file(ref))


def test_disabled_print_and_weight_intervals(scene_dir, tmp_path):
    """i_print=0 / i_weights=0 mean 'disabled', not ZeroDivisionError (the
    dispatch-batching boundary logic already treats n<=0 that way)."""
    cfg = _tiny_cfg(scene_dir, tmp_path, N_iters=8, i_print=0, i_weights=0)
    state = train(cfg)
    assert int(state.step) == 8


def test_oversized_patch_rejected_at_build(scene_dir, tmp_path):
    """The in-jit patch sampler would silently clamp its crop; the step
    builder must reject patches larger than the image up front."""
    cfg = _tiny_cfg(
        scene_dir, tmp_path, N_iters=10, feature_loss=True,
        feature_start_iteration=1, feature_loss_every_n=5,
        vgg_layers=["conv1_2"], vgg_layer_weights=[1.0], vgg_loss_type="l1",
        nH=64, nW=16, gradH=4, gradW=4,  # nH=64 > H=24
    )
    with pytest.raises(ValueError, match="larger than image"):
        train(cfg)


def test_flags_doc_covers_every_field():
    """docs/FLAGS.md must document every TrainConfig field by name."""
    import dataclasses

    doc = open("docs/FLAGS.md").read()
    missing = [f.name for f in dataclasses.fields(TrainConfig)
               if f"`{f.name}`" not in doc]
    assert not missing, f"undocumented flags: {missing}"


def test_prewarm_does_not_change_trajectory(scene_dir, tmp_path, monkeypatch):
    """The background variant pre-warmer (loop._prewarm_async) compiles step
    variants on throwaway state clones concurrently with training; the
    trained result must be bit-identical to a run with warming disabled."""
    import jax

    def run(warm, sub):
        monkeypatch.setenv("DLNERF_PREWARM", "1" if warm else "0")
        cfg = _tiny_cfg(scene_dir, str(tmp_path) + sub, N_iters=25, i_print=25,
                        i_weights=25, colmap_depth=True, depth_loss=True,
                        depth_inverse_loss=True, depth_inverse_loss_every_n=5,
                        feature_loss=True, feature_start_iteration=1,
                        feature_loss_every_n=5, feature_lambda=0.01,
                        vgg_layers=["conv1_2"], vgg_layer_weights=[1.0],
                        nH=12, nW=16, gradH=4, gradW=4)
        os.makedirs(str(tmp_path) + sub, exist_ok=True)
        return train(cfg)

    s_warm = run(True, "w")
    s_cold = run(False, "c")
    a = jax.tree.leaves(s_warm.params)
    b = jax.tree.leaves(s_cold.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_cycle_dispatch_matches_unbatched(scene_dir, tmp_path):
    """cycle_dispatch (one fused dispatch per plain-steps + patch-step
    period, step.make_cycle_step) must reproduce the three-dispatch
    trajectory: the fused program calls the SAME traced step bodies with
    the same per-iteration rng folds."""
    import jax

    kw = dict(N_iters=20, i_weights=20, i_print=20, colmap_depth=True,
              depth_loss=True, feature_loss=True, feature_start_iteration=1,
              feature_loss_every_n=5, vgg_layers=["conv1_2"],
              vgg_layer_weights=[1.0], vgg_loss_type="l1",
              depth_inverse_loss=True, depth_inverse_loss_every_n=5,
              nH=12, nW=16, gradH=4, gradW=4, steps_per_dispatch=0)
    cfg_a = _tiny_cfg(scene_dir, tmp_path / "a", cycle_dispatch=False, **kw)
    sa = train(cfg_a)
    cfg_b = _tiny_cfg(scene_dir, tmp_path / "b", cycle_dispatch=True, **kw)
    sb = train(cfg_b)
    assert int(sa.step) == int(sb.step) == 20
    for a, b in zip(jax.tree_util.tree_leaves(sa.params),
                    jax.tree_util.tree_leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_gan_phase_batching_matches_unbatched(scene_dir, tmp_path):
    """Past gan_start EVERY iteration is a patch iteration
    (run_nerf.py:1552-1554); the round-5 generalization scans and
    cycle-fuses those patch variants (in-jit sampling). Trajectory must
    match the one-dispatch-per-step baseline for BOTH generator and
    discriminator parameters."""
    import jax

    kw = dict(N_iters=24, i_weights=24, i_print=24, colmap_depth=True,
              depth_loss=True, gan_loss=True, gan_start_iteration=4,
              gan_lambda=0.05, depth_inverse_loss=True,
              depth_inverse_loss_every_n=8,
              nH=12, nW=16, gradH=4, gradW=4)
    cfg_a = _tiny_cfg(scene_dir, tmp_path / "a", steps_per_dispatch=1,
                      cycle_dispatch=False, **kw)
    sa = train(cfg_a)
    cfg_b = _tiny_cfg(scene_dir, tmp_path / "b", steps_per_dispatch=0,
                      cycle_dispatch=True, **kw)
    sb = train(cfg_b)
    assert int(sa.step) == int(sb.step) == 24
    for tree_a, tree_b in ((sa.params, sb.params),
                           (sa.disc_params, sb.disc_params)):
        for a, b in zip(jax.tree_util.tree_leaves(tree_a),
                        jax.tree_util.tree_leaves(tree_b)):
            # atol 4e-6: the scanned discriminator step fuses differently
            # from the per-step dispatch (float reassociation only — the
            # printed loss/psnr trajectories are bit-identical)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=4e-6)
