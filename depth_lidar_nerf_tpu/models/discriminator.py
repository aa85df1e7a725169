"""Patch discriminators for the adversarial loss, as Flax modules.

Parity targets: ``discriminator.py:19-61`` (ESRGAN-style, the one the train
loop instantiates at ``run_nerf.py:1253``), ``discriminator.py:64-91`` (LS),
``discriminator.py:93-117`` (Basic). Tensors are NHWC (TPU-native layout); the
reference is NCHW. LeakyReLU slope is 0.2 throughout.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class ESRDiscriminator(nn.Module):
    """Two conv blocks (16, 32 filters), each stride-1 then stride-2 conv,
    followed by a single linear logit over the flattened 4x-downsampled patch.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # x: [B, H, W, 3]
        conv = lambda f, s, name: nn.Conv(  # noqa: E731
            f, (3, 3), strides=(s, s), padding=((1, 1), (1, 1)), dtype=self.dtype,
            name=name,
        )
        for bi, filters in enumerate((16, 32)):
            x = _lrelu(conv(filters, 1, f"block{bi}_conv0")(x))
            x = _lrelu(conv(filters, 2, f"block{bi}_conv1")(x))
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(1, dtype=self.dtype, name="classifier")(x)  # [B, 1]


class LSDiscriminator(nn.Module):
    """Four stride-2 conv blocks (16/32/64/128) and a linear logit."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for bi, filters in enumerate((16, 32, 64, 128)):
            x = _lrelu(
                nn.Conv(filters, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name=f"block{bi}_conv")(x)
            )
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(1, dtype=self.dtype, name="adv")(x)


class BasicDiscriminator(nn.Module):
    """Single stride-2 conv block (16 filters) with dropout and a linear logit."""

    dtype: jnp.dtype = jnp.float32
    dropout_rate: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        x = _lrelu(
            nn.Conv(16, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv")(x)
        )
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(1, dtype=self.dtype, name="adv")(x)
