"""Training subsystem: config, losses, train state, jitted steps, driver.

Public API::

    from depth_lidar_nerf_tpu.train import TrainConfig, train, parse_args

    train(TrainConfig(datadir=..., colmap_depth=True, depth_loss=True))
"""

from depth_lidar_nerf_tpu.train.config import TrainConfig, parse_args

__all__ = ["TrainConfig", "parse_args", "train"]


def train(cfg):
    """Run the training driver (lazy import keeps `import ...train` light)."""
    from depth_lidar_nerf_tpu.train.loop import train as _train

    return _train(cfg)
