"""Measure the shipped-config (N_rand=1024) training rate with and without
K-step dispatch batching (steps_per_dispatch; VERDICT round-2 #3).

The reference's flagship config trains 1024 rays/step
(configs/fern_dsnerf.txt:6); one dispatch per step cannot feed the chip.
This drives the REAL train() loop (the batching lives there, not in the
step function) on the bench scene and reports the steady-state rays/s from
the driver's own [TRAIN] lines.

    python scripts/bench_small_batch.py            # K auto (16) and K=1
    python scripts/bench_small_batch.py 16         # just K=16
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def run(k: int, d: str) -> list[float]:
    from depth_lidar_nerf_tpu.train.config import TrainConfig
    from depth_lidar_nerf_tpu.train.loop import train

    with tempfile.TemporaryDirectory() as base:
        cfg = TrainConfig(
            expname=f"smallbatch_k{k}", basedir=base, datadir=d,
            dataset_type="llff", factor=0, llffhold=0, test_scene=[-1],
            N_rand=1024, N_samples=64, N_importance=64, netdepth=4,
            netwidth=256, netdepth_fine=4, netwidth_fine=256,
            use_viewdirs=True, no_ndc=True, raw_noise_std=1.0,
            colmap_depth=True, depth_loss=True, depth_lambda=0.01,
            compute_dtype="bfloat16", steps_per_dispatch=k,
            N_iters=4096, i_print=512, i_weights=10 ** 9, i_testset=0,
            i_video=0, i_img=0, should_seed=True,
        )
        buf = io.StringIO()

        class Tee(io.TextIOBase):
            def write(self, s):
                buf.write(s)
                sys.__stdout__.write(s)
                return len(s)

        with contextlib.redirect_stdout(Tee()):
            train(cfg)
    rates = [float(m.group(1).replace(",", "")) for m in re.finditer(
        r"rays/s ([\d,]+)", buf.getvalue())]
    return rates


def main():
    ks = [int(a) for a in sys.argv[1:]] or [0, 1]
    from depth_lidar_nerf_tpu.data.synthetic import make_scene

    d = os.path.join(tempfile.gettempdir(), "smallbatch_scene")
    if not os.path.exists(os.path.join(d, "poses_bounds.npy")):
        make_scene(d, n_images=4, H=94, W=352, focal=88.0,
                   n_depth_points=8000, backdrop=True)

    for k in ks:
        rates = run(k, d)
        if not rates:
            print(f"[RESULT] steps_per_dispatch={k or 'auto'} "
                  "no '[TRAIN] ... rays/s' lines captured", flush=True)
            continue
        steady = max(rates[1:]) if len(rates) > 1 else rates[-1]
        print(f"[RESULT] steps_per_dispatch={k or 'auto'} "
              f"steady rays/s {steady:,.0f} (windows: "
              + ", ".join(f"{r:,.0f}" for r in rates) + ")", flush=True)


if __name__ == "__main__":
    main()
