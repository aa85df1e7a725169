"""Head-to-head training differential: the reference's OWN ``train()``
(torch-CPU, via ``scripts/ref_train_driver.py``) vs ours, on a shared
synthetic scene under a matched config.

This closes the last parity claim left open by the unit-level differentials:
every piece (embedder, rays, sample_pdf, raw2outputs, losses, loaders, decay
math) is diffed in isolation in ``tests/test_reference*_differential.py``;
here the two WHOLE training loops run side by side and must agree
(a) on the loss/PSNR trajectory (distributional — RNG streams differ by
design, SURVEY §7), and (b) bitwise-scale on cross-renders: our final
checkpoint exported to the reference's ``.tar`` format renders through THEIR
pipeline to the same image ours produces, and their ``.tar`` imports and
renders through OURS.

Usage:
    python scripts/head_to_head.py [--iters 400] [--workdir /tmp/h2h]
        [--out results/HEAD_TO_HEAD.json] [--patch] [--cpu]

``--patch`` additionally turns on the smoothness + GAN patch losses (the
VGG feature leg cannot run on the reference side — torchvision's pretrained
weights are unavailable in this zero-egress image; its parity is pinned by
``tests/test_vgg_torch_golden.py`` instead).
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def write_config(path, datadir, basedir, expname, iters, patch=False):
    lines = f"""
expname = {expname}
basedir = {basedir}
datadir = {datadir}
dataset_type = llff
factor = 1
llffhold = 5
netdepth = 4
netwidth = 128
netdepth_fine = 4
netwidth_fine = 128
use_viewdirs = True
N_rand = 192
N_samples = 32
N_importance = 32
chunk = 8192
netchunk = 16384
lrate = 5e-4
lrate_decay = 5
N_iters = {iters}
colmap_depth = True
depth_loss = True
depth_lambda = 0.1
depth_rays_prop = 0.333
semantic_loss = True
semantic_lambda = 0.04
should_seed = True
seed = 3407
i_print = 10
i_weights = {iters}
i_testset = {iters * 10}
i_img = {iters * 10}
i_video = {iters * 10}
"""
    if patch:
        lines += f"""
depth_inverse_loss = True
depth_inverse_loss_every_n = 25
depth_inverse_lambda = 0.1
gan_loss = True
gan_lambda = 0.01
gan_start_iteration = {iters // 2}
gan_noise_std = 0.1
nH = 24
nW = 24
gradH = 12
gradW = 12
"""
    with open(path, "w") as f:
        f.write(lines)
    return path


def series(scalars, tag):
    return {int(s): v for s, v in scalars.get(tag, [])}


def tail_mean(d, lo):
    vals = [v for s, v in sorted(d.items()) if s >= lo]
    return sum(vals) / len(vals) if vals else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--workdir", default="/tmp/h2h")
    ap.add_argument("--out", default=os.path.join(ROOT, "results",
                                                  "HEAD_TO_HEAD.json"))
    ap.add_argument("--patch", action="store_true",
                    help="also exercise smoothness + GAN patch losses")
    ap.add_argument("--cpu", action="store_true",
                    help="force our side onto the CPU backend")
    ap.add_argument("--psnr_tol", type=float, default=2.0,
                    help="max |final train PSNR delta| in dB (distributional "
                         "gate: same scene/model/losses, different RNG "
                         "streams and batching order)")
    ap.add_argument("--xrender_db", type=float, default=30.0,
                    help="min PSNR between the two pipelines' renders of the "
                         "SAME weights (deterministic eval path; residual is "
                         "f32 op-order + TPU/CPU rounding)")
    ns = ap.parse_args()

    if ns.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    wd = os.path.abspath(ns.workdir)
    if os.path.isdir(wd):
        shutil.rmtree(wd)
    os.makedirs(wd)
    scene = os.path.join(wd, "scene")

    # ---- shared scene (reference LLFF on-disk format) ----
    from depth_lidar_nerf_tpu.data.synthetic import make_scene
    make_scene(scene, n_images=5, H=48, W=64, backdrop=True,
               n_depth_points=500, seed=0)
    # factor=1 loads from images_1/ after a no-op minify (ImageMagick is not
    # in this image, so pre-provide the "minified" dir — both loaders then
    # take the identical path; the loader pair itself is already diffed in
    # test_reference_differential.py).
    shutil.copytree(os.path.join(scene, "images"),
                    os.path.join(scene, "images_1"))

    ref_cfg = write_config(os.path.join(wd, "ref.txt"), scene,
                           os.path.join(wd, "logs_ref"), "h2h",
                           ns.iters, ns.patch)
    our_cfg = write_config(os.path.join(wd, "our.txt"), scene,
                           os.path.join(wd, "logs_our"), "h2h",
                           ns.iters, ns.patch)

    # ---- reference side (subprocess; stubs live in ref_train_driver) ----
    ref_json = os.path.join(wd, "ref_metrics.json")
    t0 = time.time()
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "ref_train_driver.py"),
         "--mode", "train", "--config", ref_cfg, "--out", ref_json,
         "--workdir", os.path.join(wd, "ref_cwd")],
        check=True)
    ref_wall = time.time() - t0
    ref = json.load(open(ref_json))

    # ---- our side (in-process) ----
    from depth_lidar_nerf_tpu.train.config import (TrainConfig,
                                                   parse_config_file)
    from depth_lidar_nerf_tpu.train.loop import train

    cfg = TrainConfig(**parse_config_file(our_cfg))
    cfg = type(cfg)(**{**cfg.__dict__, "config": our_cfg})
    ours_hist = {}

    t0 = time.time()
    state = train(cfg, metrics_hook=lambda i, m: ours_hist.setdefault(
        "rows", []).append({"i": i, **m}))
    our_wall = time.time() - t0

    # ---- trajectory comparison ----
    lo = int(ns.iters * 0.9)
    r_psnr = tail_mean(series(ref["scalars"], "Train/psnr"), lo)
    r_img = tail_mean(series(ref["scalars"], "Train/img_loss"), lo)
    # the reference logs depth_loss pre-scaled by lambda*importance
    # (run_nerf.py:1962); unscale with its own recorded importance
    r_dscaled = series(ref["scalars"], "Train/depth_loss")
    r_imp = series(ref["scalars"], "Train/depth_importance")
    r_depth_raw = tail_mean(
        {s: v / (0.1 * r_imp[s]) for s, v in r_dscaled.items() if s in r_imp},
        lo)
    rows = ours_hist["rows"]
    o_tail = [r for r in rows if r["i"] >= lo]
    o_psnr = sum(r["psnr"] for r in o_tail) / len(o_tail)
    o_img = sum(r["img_loss"] for r in o_tail) / len(o_tail)
    o_depth = sum(r["depth_loss"] for r in o_tail) / len(o_tail)

    # ---- cross-renders (same weights, both pipelines) ----
    import numpy as np

    import jax.numpy as jnp

    from depth_lidar_nerf_tpu.evaluation.metrics import psnr as psnr_np
    from depth_lidar_nerf_tpu.render import render_image
    from depth_lidar_nerf_tpu.train.config import render_config_from
    from depth_lidar_nerf_tpu.train.loop import load_scene
    from depth_lidar_nerf_tpu.train.state import build_models, init_train_state
    from depth_lidar_nerf_tpu.train.torch_import import (
        export_reference_checkpoint, import_reference_checkpoint)

    sc = load_scene(cfg)
    H, W, focal = sc.hwf
    import dataclasses as _dc
    rcfg = render_config_from(cfg, sc.num_semantic_classes, sc.near, sc.far)
    rcfg_eval = _dc.replace(rcfg, perturb=False, raw_noise_std=0.0,
                            cull_eps=0.0)
    models = build_models(cfg, rcfg)
    pose_idx = int(sc.i_test[0])
    pose = jnp.asarray(sc.poses[pose_idx])

    def ours_render(params):
        out = render_image(models.coarse, models.fine, params, H, W, focal,
                           pose, rcfg_eval)
        return np.asarray(out["rgb_map"], np.float64)

    def ref_render(tar):
        out_npz = os.path.join(wd, f"refrender_{os.path.basename(tar)}.npz")
        subprocess.run(
            [sys.executable,
             os.path.join(ROOT, "scripts", "ref_train_driver.py"),
             "--mode", "render", "--config", ref_cfg, "--ckpt", tar,
             "--pose_idx", str(pose_idx), "--out", out_npz,
             "--workdir", os.path.join(wd, "ref_cwd")],
            check=True)
        return np.load(out_npz)["rgb"].astype(np.float64)

    gt = np.asarray(sc.images[pose_idx], np.float64)

    # (a) our trained weights -> .tar export -> their renderer
    our_tar = os.path.join(wd, "ours_export.tar")
    export_reference_checkpoint(state, our_tar, verbose=False)
    img_theirs_of_ours = ref_render(our_tar)
    img_ours_of_ours = ours_render(state.params)
    xr_ours = float(psnr_np(img_theirs_of_ours, img_ours_of_ours))

    # (b) their trained .tar -> our importer -> our renderer
    ref_tar = os.path.join(wd, "logs_ref", "h2h", f"{ns.iters:06d}.tar")
    import jax
    st_imp = import_reference_checkpoint(
        ref_tar,
        init_train_state(cfg, rcfg, models, jax.random.key(0)),
        verbose=False)
    img_ours_of_theirs = ours_render(st_imp.params)
    img_theirs_of_theirs = ref_render(ref_tar)
    xr_theirs = float(psnr_np(img_ours_of_theirs, img_theirs_of_theirs))

    report = {
        "config": {"iters": ns.iters, "patch": ns.patch,
                   "scene": "synthetic LLFF 5x48x64 backdrop",
                   "losses": (["rgb", "coarse", "depth", "semantic"]
                              + (["smoothness", "gan"] if ns.patch else []))},
        "trajectory": {
            "ref_final_train_psnr": r_psnr, "ours_final_train_psnr": o_psnr,
            "psnr_delta_db": abs(r_psnr - o_psnr),
            "ref_img_loss": r_img, "ours_img_loss": o_img,
            "ref_depth_loss_raw": r_depth_raw, "ours_depth_loss": o_depth,
        },
        "cross_render": {
            "pose_idx": pose_idx,
            "ours_weights_theirs_vs_ours_render_psnr": xr_ours,
            "theirs_weights_ours_vs_theirs_render_psnr": xr_theirs,
            "theirs_of_ours_vs_gt_psnr": float(psnr_np(img_theirs_of_ours, gt)),
            "ours_of_theirs_vs_gt_psnr": float(psnr_np(img_ours_of_theirs, gt)),
        },
        "wall_clock": {
            "ref_torch_cpu_s": ref.get("wall_s", ref_wall),
            "ours_s": our_wall,
            "ref_it_per_s": ns.iters / ref.get("wall_s", ref_wall),
            "ours_it_per_s": ns.iters / our_wall,
        },
        "gates": {},
    }
    g = report["gates"]
    g["trajectory_psnr_within_tol"] = bool(
        abs(r_psnr - o_psnr) <= ns.psnr_tol)
    # the coarse loss ordering: depth term should be the smaller term on both
    # sides late in training (the scene's depth field is easy; RGB dominates)
    g["loss_ordering_match"] = bool(
        (r_img > r_depth_raw * 0.1) == (o_img > o_depth * 0.1))
    g["cross_render_ours_to_theirs"] = bool(xr_ours >= ns.xrender_db)
    g["cross_render_theirs_to_ours"] = bool(xr_theirs >= ns.xrender_db)
    g["all"] = all(v for v in g.values())

    os.makedirs(os.path.dirname(ns.out), exist_ok=True)
    with open(ns.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    if not g["all"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
