"""CLI entry: ``python -m depth_lidar_nerf_tpu.train --config configs/x.txt``.

Same interface as ``python run_nerf.py --config ...`` in the reference
(``run_nerf.py:2028-2031``).
"""

from depth_lidar_nerf_tpu.train.config import parse_args
from depth_lidar_nerf_tpu.train.loop import train

if __name__ == "__main__":
    train(parse_args())
