"""Truncated ResNet-18 feature extractor (alternative perceptual backbone).

Parity: ``external_models_resnet.py:17-40`` — torchvision resnet18 cut at a
named layer, used as a drop-in alternative to VGG19 for the content loss.
Flax/NHWC; weights convertible from a torchvision state_dict.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda f, k, s, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s), padding="SAME", use_bias=False,
            dtype=self.dtype, name=name)
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, dtype=self.dtype, name=name)
        y = nn.relu(norm("bn1")(conv(self.filters, 3, self.strides, "conv1")(x)))
        y = norm("bn2")(conv(self.filters, 3, 1, "conv2")(y))
        if x.shape[-1] != self.filters or self.strides != 1:
            x = norm("bn_proj")(conv(self.filters, 1, self.strides, "proj")(x))
        return nn.relu(x + y)


class ResNet18Features(nn.Module):
    """Runs resnet18 up to ``output_layer`` ('layer1'..'layer4')."""

    output_layer: str = "layer1"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        stages = (("layer1", 64, 1), ("layer2", 128, 2), ("layer3", 256, 2),
                  ("layer4", 512, 2))
        for name, filters, stride in stages:
            x = BasicBlock(filters, stride, self.dtype, name=f"{name}_0")(x, train)
            x = BasicBlock(filters, 1, self.dtype, name=f"{name}_1")(x, train)
            if name == self.output_layer:
                return x
        return x
