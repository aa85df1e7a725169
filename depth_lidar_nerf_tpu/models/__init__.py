"""Flax model zoo: NeRF MLPs, GAN discriminators, VGG19 feature extractor."""

from depth_lidar_nerf_tpu.models.nerf_mlp import NeRFMLP
from depth_lidar_nerf_tpu.models.discriminator import (
    DCDiscriminator,
    ESRDiscriminator,
    LSDiscriminator,
    BasicDiscriminator,
)
from depth_lidar_nerf_tpu.models.vgg import VGG19Features, vgg_normalize

__all__ = [
    "NeRFMLP",
    "DCDiscriminator",
    "ESRDiscriminator",
    "LSDiscriminator",
    "BasicDiscriminator",
    "VGG19Features",
    "vgg_normalize",
]
