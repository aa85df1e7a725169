"""Export a trained orbax checkpoint as a reference-format torch ``.tar``.

Usage:
    python scripts/export_reference_ckpt.py --config configs/x.txt \
        [--step N] [--out path.tar]

Loads the experiment's latest (or ``--step``-pinned) orbax checkpoint with
the experiment's own config, converts the NeRF coarse/fine weights to the
reference's ``state_dict`` layout, and writes a ``.tar`` the reference's
resume path (``run_nerf.py:458-477``) loads directly — so TPU-trained
models can go back to the torch ecosystem (viewers, the original eval
scripts). Requires the CPU torch wheel for the zip writer.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step (default: latest)")
    ap.add_argument("--out", default=None,
                    help="output .tar (default: <expdir>/<step>.tar)")
    ap.add_argument("--semantic_num_classes", type=int, default=None,
                    help="override when the training data dir is not "
                         "mounted (normally inferred from "
                         "segmentation_gt.npy, like the trainer)")
    ns = ap.parse_args()

    import numpy as np

    import jax

    from depth_lidar_nerf_tpu.train.checkpoint import (make_manager,
                                                       restore_latest)
    from depth_lidar_nerf_tpu.train.config import (TrainConfig,
                                                   parse_config_file,
                                                   render_config_from)
    from depth_lidar_nerf_tpu.train.state import (build_models,
                                                  init_train_state)
    from depth_lidar_nerf_tpu.train.torch_import import (
        export_reference_checkpoint)

    cfg = TrainConfig(**parse_config_file(ns.config))
    # The semantic head's class count is loader-filled at train time (no
    # config carries it); reproduce the loader's answer so the restore
    # template matches the checkpoint's tree.
    classes = ns.semantic_num_classes or cfg.semantic_num_classes or 0
    if cfg.semantic_loss and not classes:
        seg_path = os.path.join(cfg.datadir, "segmentation_gt.npy")
        if not os.path.exists(seg_path):
            raise SystemExit(
                "config has semantic_loss=True but the class count cannot "
                f"be inferred ({seg_path} not found) — pass "
                "--semantic_num_classes")
        classes = int(np.load(seg_path, allow_pickle=True).item()
                      ["num_classes"])
    rcfg = render_config_from(cfg, classes, 0.0, 1.0)
    models = build_models(cfg, rcfg)
    state = init_train_state(cfg, rcfg, models, jax.random.key(0))

    mgr = make_manager(cfg.basedir, cfg.expname)
    if ns.step is not None:
        from depth_lidar_nerf_tpu.train.checkpoint import restore_from_path

        path = os.path.join(cfg.basedir, cfg.expname, "checkpoints",
                            str(ns.step))
        state = restore_from_path(path, state)
    else:
        restored = restore_latest(mgr, state)
        if restored is None:
            raise SystemExit(f"no checkpoint found under "
                             f"{cfg.basedir}/{cfg.expname}")
        state = restored

    step = int(state.step)
    out = ns.out or os.path.join(cfg.basedir, cfg.expname, f"{step:06d}.tar")
    export_reference_checkpoint(state, out)
    mgr.close()  # orbax keeps a non-daemon worker alive per open manager


if __name__ == "__main__":
    main()
