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
