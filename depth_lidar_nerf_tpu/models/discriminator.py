"""Patch discriminators for the adversarial loss, as Flax modules.

Parity targets: ``discriminator.py:19-61`` (ESRGAN-style, the one the train
loop instantiates at ``run_nerf.py:1253``), ``discriminator.py:64-91`` (LS),
``discriminator.py:93-117`` (Basic), ``discriminator.py:118-151`` (DC-GAN
style; dead code upstream — run_nerf.py:1255 comments it out — shipped for
symbol-level parity). Tensors are NHWC (TPU-native layout); the reference is
NCHW. LeakyReLU slope is 0.2 throughout.
"""

from __future__ import annotations

import math

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


class DCDiscriminator(nn.Module):
    """DC-GAN style discriminator (``discriminator.py:118-151``):
    ``log2(img_size) - 2`` bias-free 4x4 stride-2 convs doubling features up
    to ``n_feat``, then a bias-free 4x4 VALID conv to one logit. Requires a
    square power-of-two input of side ``img_size`` (the reference's
    ``conv_out`` assumes the feature map has collapsed to 4x4). Extra input
    channels beyond ``in_dim`` are sliced off, as the reference's forward
    does (``discriminator.py:144-145``)."""

    in_dim: int = 3
    n_feat: int = 512
    img_size: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # x: [B, H, W, C]
        if x.shape[-1] != self.in_dim:
            x = x[..., : self.in_dim]
        n_layers = int(math.log2(self.img_size) - 2)
        for i in range(n_layers):
            feat = self.n_feat // (2 ** (n_layers - 1 - i))
            x = _lrelu(
                nn.Conv(feat, (4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, name=f"block{i}")(x)
            )
        x = nn.Conv(1, (4, 4), strides=(1, 1), padding="VALID",
                    use_bias=False, dtype=self.dtype, name="conv_out")(x)
        return x.reshape(x.shape[0], 1)


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
