"""CLI entry: ``python -m depth_lidar_nerf_tpu.train --config configs/x.txt``.

Same interface as ``python run_nerf.py --config ...`` in the reference
(``run_nerf.py:2028-2031``), plus the multi-host entry point: when
``--dist_coordinator`` is set, every participating process runs this same
command and joins one global mesh before the trainer touches the backend.
"""

from depth_lidar_nerf_tpu.train.config import parse_args

if __name__ == "__main__":
    cfg = parse_args()
    if cfg.dist_coordinator:
        # must precede any jax backend use (loop/train imports are lazy here
        # for exactly this reason)
        from depth_lidar_nerf_tpu.parallel.distributed import init_distributed

        init_distributed(
            cfg.dist_coordinator,
            num_processes=(None if cfg.dist_num_processes < 0
                           else cfg.dist_num_processes),
            process_id=(None if cfg.dist_process_id < 0
                        else cfg.dist_process_id))
    from depth_lidar_nerf_tpu.train.loop import train

    train(cfg)
