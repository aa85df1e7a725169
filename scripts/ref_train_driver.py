"""Run the reference's OWN ``train()`` (``/root/reference/run_nerf.py:885``)
on torch-CPU, recording its loss/PSNR trajectory — the reference side of the
head-to-head training differential (``scripts/head_to_head.py``).

Every unit of the reference is already diffed in isolation
(``tests/test_reference_torch_differential.py``); this driver exercises the
WHOLE: its ray-batching order, loss-schedule interleaving, depth-importance
decay and LR decay interplay, checkpoint format — live, next to ours, on a
shared scene.

The reference imports a handful of packages absent from this image
(configargparse, lpips, open3d, pytransform3d, torchvision, torchsummary,
detectron2) and hard-codes two CUDA-isms (``torch.Generator(device='cuda')``
in its DataLoader calls, ``run_nerf.py:1202-1206``, and the default-cuda
tensor type set only under ``__main__``). All are satisfied here with
minimal shims that do NOT alter the training math: the losses exercised
(RGB/coarse, depth incl. importance decay, semantic CE, smoothness, GAN)
are pure torch. VGG feature loss is the one leg that cannot run (torchvision
pretrained weights unavailable in a zero-egress image) — its parity rests on
the converted-weights goldens in ``tests/test_vgg_torch_golden.py``.

Modes:
  train:  --config C --out metrics.json   run train(), dump recorded scalars
  render: --config C --ckpt X.tar --pose_idx K --out out.npz
          build the model via create_nerf (ft_path=X), render pose K of the
          dataset's pose list through the reference's render(), save rgb+depth.
"""

import argparse
import json
import os
import sys
import time
import types

REF = os.environ.get("REF_DIR", "/root/reference")


# ---------------------------------------------------------------------------
# Import shims (harness-level; none touch the training math)
# ---------------------------------------------------------------------------

def _install_stubs():
    import torch

    # -- configargparse: argparse + the `is_config_file` kwarg + key=value
    #    config-txt pre-parse (the only features config_parser() uses).
    cap = types.ModuleType("configargparse")

    class ArgumentParser(argparse.ArgumentParser):
        def add_argument(self, *a, **kw):
            kw.pop("is_config_file", None)
            return super().add_argument(*a, **kw)

        def parse_args(self, args=None, namespace=None):
            argv = list(sys.argv[1:] if args is None else args)
            pre, _ = super().parse_known_args(argv)
            extra = []
            if getattr(pre, "config", None):
                for line in open(pre.config):
                    line = line.split("#", 1)[0].strip()
                    if "=" not in line:
                        continue
                    k, v = (s.strip() for s in line.split("=", 1))
                    if v == "True":
                        extra.append("--" + k)
                    elif v == "False":
                        pass  # store_true flags: absent = False
                    elif v.startswith("["):
                        extra.append("--" + k)
                        extra.extend(
                            t.strip() for t in v.strip("[]").split(",") if t.strip())
                    else:
                        extra.extend(["--" + k, v])
            return super().parse_args(extra + argv, namespace)

    cap.ArgumentParser = ArgumentParser
    sys.modules["configargparse"] = cap

    # -- lpips: only instantiated for the i_testset metric (run_nerf.py:1316),
    #    which the harness schedules past N_iters.
    lp = types.ModuleType("lpips")

    class LPIPS(torch.nn.Module):
        def __init__(self, net="vgg", spatial=False):
            super().__init__()

        def forward(self, a, b):
            return torch.zeros(1)

    lp.LPIPS = LPIPS
    lp.lpips = lp  # run_nerf_helpers.py:2 does `from lpips import lpips`
    sys.modules["lpips"] = lp
    sys.modules["lpips.lpips"] = lp

    # -- visualization-only deps (render_test_ray branch, never taken here)
    for name in ("open3d", "pytransform3d", "pytransform3d.visualizer"):
        sys.modules.setdefault(name, types.ModuleType(name))

    # -- torchvision: vgg19_feature_model.py imports it at module level; the
    #    Vgg19 class is only constructed when feature_loss is on.
    tv = types.ModuleType("torchvision")
    for sub in ("models", "transforms", "utils"):
        m = types.ModuleType(f"torchvision.{sub}")
        setattr(tv, sub, m)
        sys.modules[f"torchvision.{sub}"] = m
    sys.modules["torchvision"] = tv

    # -- torchsummary: create_nerf prints a summary (run_nerf.py:511-515)
    ts = types.ModuleType("torchsummary")
    ts.summary = lambda *a, **kw: "(summary unavailable)"
    sys.modules["torchsummary"] = ts

    # -- detectron2: segmentor.py needs the names at import; the offline
    #    DeepLab predictor itself is never built on the train path.
    for name, attrs in (
            ("detectron2", ()),
            ("detectron2.engine", ("DefaultPredictor",)),
            ("detectron2.config", ("get_cfg",)),
            ("detectron2.projects", ()),
            ("detectron2.projects.deeplab", ("add_deeplab_config",))):
        m = types.ModuleType(name)
        for a in attrs:
            setattr(m, a, object)
        sys.modules[name] = m

    # -- CPU-safe torch.Generator: the reference's DataLoader calls construct
    #    torch.Generator(device='cuda') inline; on the CPU wheel that raises
    #    before DataLoader ever sees it. Same RNG semantics, CPU device.
    _OrigGen = torch.Generator

    class _CPUGenerator(_OrigGen):
        # a real Generator subclass: survives torch-internal isinstance
        # checks and `torch.Generator | None` annotations
        def __new__(cls, device=None):
            return _OrigGen.__new__(cls)

    torch.Generator = _CPUGenerator


class _Recorder:
    """SummaryWriter stand-in that keeps scalars in memory."""

    def __init__(self, *a, **kw):
        self.scalars = {}

    def add_scalar(self, tag, value, step=None, *a, **kw):
        try:
            v = float(value)
        except (TypeError, ValueError):
            return
        self.scalars.setdefault(tag, []).append([int(step or 0), v])

    def add_scalars(self, tag, value_dict, step=None, *a, **kw):
        for k, v in value_dict.items():
            self.add_scalar(f"{tag}/{k}", v, step)

    def add_text(self, *a, **kw):
        pass

    add_image = add_images = add_histogram = add_figure = add_text

    def flush(self):
        pass

    def close(self):
        pass


_RECORDER = None


def _import_run_nerf():
    global _RECORDER
    _install_stubs()
    sys.path.insert(0, REF)
    import torch
    torch.autograd.set_detect_anomaly(False)  # run_nerf_helpers.py:6 sets it
    import run_nerf  # noqa: E402  (the reference module)
    _RECORDER = _Recorder()
    run_nerf.SummaryWriter = lambda *a, **kw: _RECORDER
    # imageio shim inside load_llff only: modern imageio rejects the legacy
    # ignoregamma kwarg the reference passes (load_llff.py:121) — same shim
    # as tests/test_reference_differential.py.
    import imageio.v2 as iio2
    shim = types.ModuleType("ref_imageio_shim")
    shim.imread = lambda f, **kw: iio2.imread(f)
    sys.modules["load_llff"].imageio = shim
    return run_nerf


def mode_train(ns):
    run_nerf = _import_run_nerf()
    sys.argv = ["run_nerf.py", "--config", ns.config]
    t0 = time.time()
    run_nerf.train()
    wall = time.time() - t0
    with open(ns.out, "w") as f:
        json.dump({"scalars": _RECORDER.scalars, "wall_s": wall}, f)
    print(f"[ref-train] done in {wall:.1f}s -> {ns.out}")


def mode_render(ns):
    run_nerf = _import_run_nerf()
    import numpy as np
    import torch

    sys.argv = ["run_nerf.py", "--config", ns.config]
    args = run_nerf.config_parser().parse_args()
    args.ft_path = ns.ckpt
    args.no_reload_optimizer = True  # exported .tars carry no Adam state
    images, poses, bds, _, _ = run_nerf.load_llff_data(
        args.datadir, args.factor, recenter=True, bd_factor=.75,
        spherify=args.spherify)
    hwf = poses[0, :3, -1]
    H, W, focal = int(hwf[0]), int(hwf[1]), hwf[2]
    if args.semantic_loss:
        _, n_classes = run_nerf.load_semantic_data(
            args.datadir, hwf=hwf, factor=args.factor)
        args.semantic_num_classes = n_classes
    else:
        args.semantic_num_classes = None
    near, far = (np.min(bds) * .9, np.max(bds) * 1.) if args.no_ndc \
        else (0., 1.)
    _, render_kwargs_test, _, _, _ = run_nerf.create_nerf(args)
    render_kwargs_test.update({"near": near, "far": far})
    c2w = torch.Tensor(poses[ns.pose_idx, :3, :4])
    with torch.no_grad():
        rgb, disp, acc, depth, extras = run_nerf.render(
            H, W, focal, chunk=args.chunk, c2w=c2w, retraw=False,
            **render_kwargs_test)
    np.savez(ns.out, rgb=rgb.cpu().numpy(), depth=depth.cpu().numpy(),
             disp=disp.cpu().numpy(), gt=images[ns.pose_idx])
    print(f"[ref-render] pose {ns.pose_idx} -> {ns.out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["train", "render"], default="train")
    ap.add_argument("--config", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--pose_idx", type=int, default=0)
    ap.add_argument("--workdir", default=None,
                    help="cwd for the run (run_nerf writes render_poses.npy "
                         "and runs/ into the cwd)")
    ns = ap.parse_args()
    ns.config = os.path.abspath(ns.config)
    ns.out = os.path.abspath(ns.out)
    if ns.ckpt:
        ns.ckpt = os.path.abspath(ns.ckpt)
    if ns.workdir:
        os.makedirs(ns.workdir, exist_ok=True)
        os.chdir(ns.workdir)
    if ns.mode == "train":
        mode_train(ns)
    else:
        mode_render(ns)


if __name__ == "__main__":
    main()
