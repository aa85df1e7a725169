"""Offline metrics CLI: PSNR / SSIM / LPIPS over generated-vs-GT image dirs.

Parity: ``eval_metrics_script.py:20-65`` — pairs PNGs from two directories in
sorted order, prints per-image and mean/std metrics. LPIPS uses the Flax
implementation (``models/lpips.py``; converted weights via --lpips_weights).

Usage::

    python -m depth_lidar_nerf_tpu.evaluation.eval_metrics \
        --generated_dir out/ --gt_dir gt/ [--no_lpips] [--lpips_weights f.pth]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from depth_lidar_nerf_tpu.evaluation.metrics import psnr, ssim_np

_EXT = (".png", ".jpg", ".jpeg")


def _load_dir(d):
    from depth_lidar_nerf_tpu.utils.images import imread_rgb_float

    files = [os.path.join(d, f) for f in sorted(os.listdir(d))
             if f.lower().endswith(_EXT) and "depth" not in f]
    return files, [imread_rgb_float(f) for f in files]


def evaluate_dirs(generated_dir: str, gt_dir: str, use_lpips: bool = True,
                  lpips_weights: str | None = None):
    gen_files, gen = _load_dir(generated_dir)
    gt_files, gt = _load_dir(gt_dir)
    if len(gen) != len(gt):
        raise ValueError(f"{len(gen)} generated vs {len(gt)} gt images")

    lpips_fn = None
    if use_lpips:
        import jax

        from depth_lidar_nerf_tpu.models.lpips import init_lpips

        model, params = init_lpips(jax.random.key(0),
                                   weights_path=lpips_weights)
        lpips_fn = jax.jit(lambda a, b: model.apply(params, a, b))

    rows = []
    for f, a, b in zip(gen_files, gen, gt):
        if a.shape != b.shape:
            raise ValueError(f"shape mismatch for {f}: {a.shape} vs {b.shape}")
        row = {
            "file": os.path.basename(f),
            "psnr": psnr(a, b),
            "ssim": ssim_np(a, b),
        }
        if lpips_fn is not None:
            row["lpips"] = float(np.asarray(
                lpips_fn(a[None].astype(np.float32), b[None].astype(np.float32))
            )[0])
        rows.append(row)
    summary = {}
    for key in ("psnr", "ssim", "lpips"):
        vals = [r[key] for r in rows if key in r]
        if vals:
            summary[key] = (float(np.mean(vals)), float(np.std(vals)))
    return rows, summary


def main(argv=None):
    ap = argparse.ArgumentParser("eval_metrics")
    ap.add_argument("--generated_dir", required=True)
    ap.add_argument("--gt_dir", required=True)
    ap.add_argument("--no_lpips", action="store_true")
    ap.add_argument("--lpips_weights", default=None)
    args = ap.parse_args(argv)

    rows, summary = evaluate_dirs(args.generated_dir, args.gt_dir,
                                  use_lpips=not args.no_lpips,
                                  lpips_weights=args.lpips_weights)
    for r in rows:
        extras = f"  lpips {r['lpips']:.4f}" if "lpips" in r else ""
        print(f"{r['file']}: psnr {r['psnr']:.2f}  ssim {r['ssim']:.4f}{extras}")
    for k, (m, s) in summary.items():
        print(f"mean {k}: {m:.4f} (std {s:.4f})")


if __name__ == "__main__":
    main()
