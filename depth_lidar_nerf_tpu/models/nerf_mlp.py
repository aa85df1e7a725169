"""The NeRF radiance-field MLP as a Flax module.

Architecture parity with the reference ``NeRF`` (``run_nerf_helpers.py:77-174``):

- ``D`` trunk layers of width ``W`` with ReLU, skip-concat of the encoded
  position after layer index ``i in skips`` (so ``netdepth=4`` with
  ``skips=(4,)`` has no live skip, exactly like the reference's shipped
  KITTI configs);
- with view directions: a 1-channel density head off the trunk, a ``W``-wide
  feature layer, one ``W//2`` view-conditioned layer, a 3-channel RGB head;
- optional semantic head ``Dense(W//2) -> Dense(num_classes)`` (no activation
  in between, matching ``run_nerf_helpers.py:109``) fed from the feature
  vector, *before* view conditioning;
- output layout ``[rgb(3), sigma(1), semantic(C)]``.

TPU-first deltas from the reference: the module runs on ``[..., channels]``
tensors directly (no flatten/chunk loops — one fused XLA computation over the
full ray x sample batch), and supports bfloat16 compute with float32 params
(``dtype`` / ``param_dtype``); the MXU sees large ``[N*S, W]`` matmuls.

The frozen-alpha ``NeRF_RGB`` variant (``run_nerf_helpers.py:176-260``) is
expressed functionally: pass ``frozen_sigma`` (computed from the frozen alpha
model under ``stop_gradient``) and the module substitutes it for its own
density head.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class NeRFMLP(nn.Module):
    depth: int = 8
    width: int = 256
    in_channels: int = 63  # encoded position
    in_channels_views: int = 27  # encoded view direction
    skips: Sequence[int] = (4,)
    use_viewdirs: bool = True
    num_semantic_classes: int = 0
    output_ch: int = 4  # only used when use_viewdirs=False (run_nerf.py:398)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pts_embed: jnp.ndarray, views_embed: jnp.ndarray | None = None,
                 frozen_sigma: jnp.ndarray | None = None) -> jnp.ndarray:
        dense = lambda feats, name: nn.Dense(  # noqa: E731
            feats, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        x = pts_embed.astype(self.dtype)
        h = x
        for i in range(self.depth):
            h = nn.relu(dense(self.width, f"trunk_{i}")(h))
            if i in self.skips:
                h = jnp.concatenate([x, h], axis=-1)

        if not self.use_viewdirs:
            return dense(self.output_ch, "output")(h)

        sigma = dense(1, "sigma")(h)
        if frozen_sigma is not None:
            sigma = frozen_sigma.astype(sigma.dtype)
        feature = dense(self.width, "feature")(h)

        semantic = None
        if self.num_semantic_classes > 0:
            semantic = dense(self.num_semantic_classes, "semantic_1")(
                dense(self.width // 2, "semantic_0")(feature)
            )

        h = jnp.concatenate([feature, views_embed.astype(self.dtype)], axis=-1)
        h = nn.relu(dense(self.width // 2, "views_0")(h))
        rgb = dense(3, "rgb")(h)

        out = jnp.concatenate([rgb, sigma], axis=-1)
        if semantic is not None:
            out = jnp.concatenate([out, semantic], axis=-1)
        return out
