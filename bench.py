"""Benchmark: training-step throughput in rays/sec on the available device.

Runs the full flagship train step (fern_dsnerf scale: netdepth 4 / width 256 /
64 coarse + 64 fine samples, RGB + depth supervision, bfloat16 compute) on a
synthetic analytic scene and reports ONE JSON line.

The measurement is taken in the *steady state*: the model first trains for
``BENCH_WARMUP`` steps so the density field is converged-ish, which is where
>99% of a real 100k-200k-iteration run (configs/fern_dsnerf.txt:19) is spent.
This matters because the framework's transmittance culling (``cull_eps``)
skips the backward FLOPs of occluded samples — a fresh random field has no
occlusion to cull, a trained one does. ``BENCH_WARMUP=0`` measures the
fresh-field rate; ``BENCH_CULL=0`` disables culling entirely (strict
reference math).

Baseline framing (BASELINE.md): the driver's north-star is >= 2M rays/sec on
a TPU v4-8 (4 chips), i.e. 500k rays/sec/chip; the reference PyTorch code
runs N_rand=1024 single-GPU with chunked Python loops. ``vs_baseline`` is
measured rays/sec on this host's chip divided by the 500k/chip target.

Knobs via env: BENCH_N_RAND (default 16384), BENCH_STEPS (default 30),
BENCH_WARMUP (default 400), BENCH_DTYPE, BENCH_FUSED, BENCH_CULL.
BENCH_SEMANTIC=1 benches the TRUE reference-headline stack
(configs/fern_dsnerf.txt trains with the semantic CE loss on, SURVEY §5):
adds the 19-class semantic head + CE on both passes, reporting the metric
as ``train_rays_per_sec_semantic``. BENCH_NETDEPTH_FINE (default 4, the
headline-continuity shape) sets the fine MLP depth; 8 is the reference's
actual default (fern_dsnerf.txt sets netdepth=4 but leaves netdepth_fine
at 8 with the skip@4 concat, run_nerf.py:693).
"""

from __future__ import annotations

import json
import os
import tempfile
import time

# This container ships several pythons and only /opt/venv has jax/numpy
# (observed: /usr/local/bin/python has neither). If the invoking interpreter
# cannot import the stack, re-exec under the venv one so `python bench.py`
# works regardless of which python resolves first on PATH.
try:
    import numpy  # noqa: F401
except ImportError:  # pragma: no cover
    import sys

    _venv = "/opt/venv"
    # The venv python symlinks to the same binary, so compare prefixes.
    if os.path.exists(_venv + "/bin/python") and sys.prefix != _venv:
        os.execv(_venv + "/bin/python", [_venv + "/bin/python"] + sys.argv)
    raise


def main():
    # NOTE: jax_compilation_cache_dir was tried here and HANGS under the axon
    # remote-compile tunnel (the executable never serializes back); compiles
    # stay per-process, so the bench pays ~8 min of first-compile wall time.
    import jax
    import numpy as np

    from depth_lidar_nerf_tpu.data.synthetic import make_scene
    from depth_lidar_nerf_tpu.train.config import TrainConfig, render_config_from
    from depth_lidar_nerf_tpu.train.loop import load_scene
    from depth_lidar_nerf_tpu.train.state import build_models, init_train_state
    from depth_lidar_nerf_tpu.train.step import make_train_step
    from depth_lidar_nerf_tpu.train.tables import build_depth_table, build_rgb_table

    n_rand = int(os.environ.get("BENCH_N_RAND", 16384))
    n_steps = int(os.environ.get("BENCH_STEPS", 30))
    n_warmup = int(os.environ.get("BENCH_WARMUP", 400))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    use_fused = os.environ.get("BENCH_FUSED", "1") == "1"
    cull_eps = 1e-4 if os.environ.get("BENCH_CULL", "1") == "1" else 0.0
    semantic = os.environ.get("BENCH_SEMANTIC", "0") == "1"
    fine_depth = int(os.environ.get("BENCH_NETDEPTH_FINE", 4))

    with tempfile.TemporaryDirectory() as d:
        make_scene(d, n_images=4, H=94, W=352, focal=88.0,
                   n_depth_points=8000, backdrop=True,
                   num_classes=19 if semantic else None)
        cfg = TrainConfig(
            datadir=d, dataset_type="llff", factor=0, llffhold=0,
            test_scene=[-1],
            N_rand=n_rand, N_samples=64, N_importance=64, netdepth=4,
            netwidth=256, netdepth_fine=fine_depth, netwidth_fine=256,
            use_viewdirs=True, no_ndc=True, raw_noise_std=1.0,
            colmap_depth=True, depth_loss=True, depth_lambda=0.01,
            semantic_loss=semantic, semantic_lambda=0.04,
            compute_dtype=dtype, use_fused_mlp=use_fused, cull_eps=cull_eps,
        )
        scene = load_scene(cfg)
        H, W, focal = scene.hwf
        rcfg = render_config_from(cfg, scene.num_semantic_classes if semantic
                                  else 0, scene.near, scene.far)
        models = build_models(cfg, rcfg)
        state = init_train_state(cfg, rcfg, models, jax.random.key(0))
        rgb_t = build_rgb_table(scene.images, scene.poses, scene.i_train,
                                H, W, focal, rcfg,
                                scene.segmentation if semantic else None)
        dep_t = build_depth_table(scene.depth_gts, scene.poses, scene.i_train,
                                  H, W, focal, rcfg)
        step = make_train_step(cfg, rcfg, models, scene.hwf)

        # Compile + drive to the steady state the long runs live in.
        state, m = step(state, rgb_t, dep_t, None, None, jax.random.key(1))
        for i in range(n_warmup):
            state, m = step(state, rgb_t, dep_t, None, None,
                            jax.random.key(2 + i))
        # Honest device barrier (block_until_ready returns early over the
        # axon tunnel): fetch a value that depends on every prior step.
        psnr = float(m["psnr"])

        t0 = time.perf_counter()
        for i in range(n_steps):
            state, m = step(state, rgb_t, dep_t, None, None,
                            jax.random.key(10_000 + i))
        _ = float(m["loss"])
        dt = time.perf_counter() - t0

    rays_per_sec = n_rand * n_steps / dt
    print(json.dumps({
        "metric": ("train_rays_per_sec_semantic" if semantic
                   else "train_rays_per_sec"),
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / 500_000.0, 3),
        "train_psnr_at_warmup": round(psnr, 2),
    }))


if __name__ == "__main__":
    main()
