"""VGG feature-inversion demo: optimize an image to match target features.

Parity: the ``__main__`` demo of ``vgg19_feature_model.py:91-199`` — a
standalone sanity check that the feature extractor carries enough signal for
content losses. JAX version: Adam on pixels against the Flax VGG19 taps.

Usage: ``python scripts/vgg_style_demo.py [target.png] [out.png]``
(no args: runs on a synthetic target).
"""

from __future__ import annotations

import sys
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import numpy as np

import jax
import jax.numpy as jnp
import optax

from depth_lidar_nerf_tpu.models import VGG19Features, vgg_normalize
from depth_lidar_nerf_tpu.train.losses import mse2psnr


def main(target_path: str | None = None, out_path: str = "style_demo_out.png",
         steps: int = 300):
    if target_path:
        import imageio.v2 as imageio

        target = np.asarray(imageio.imread(target_path))[..., :3] / 255.0
        target = target[None].astype(np.float32)
    else:
        yy, xx = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 1, 64),
                             indexing="ij")
        target = np.stack([xx, yy, (xx * yy)], -1)[None].astype(np.float32)

    taps = ("conv1_2", "conv2_2", "conv3_4")
    model = VGG19Features(taps=taps)
    params = model.init(jax.random.key(0), jnp.asarray(target))
    target_feats = jax.lax.stop_gradient(
        model.apply(params, vgg_normalize(jnp.asarray(target))))

    img = jax.random.uniform(jax.random.key(1), target.shape)
    opt = optax.adam(2e-2)
    opt_state = opt.init(img)

    @jax.jit
    def step(img, opt_state):
        def loss_fn(im):
            feats = model.apply(params, vgg_normalize(jnp.clip(im, 0, 1)))
            return sum(jnp.mean((feats[t] - target_feats[t]) ** 2)
                       for t in taps)

        loss, g = jax.value_and_grad(loss_fn)(img)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(img, upd), opt_state, loss

    for i in range(steps):
        img, opt_state, loss = step(img, opt_state)
        if i % 50 == 0:
            mse = float(jnp.mean((jnp.clip(img, 0, 1) - target) ** 2))
            print(f"step {i}: feature loss {float(loss):.5f} "
                  f"pixel psnr {float(mse2psnr(jnp.float32(mse))):.2f} dB")

    out = np.asarray(jnp.clip(img[0], 0, 1))
    try:
        import imageio.v2 as imageio

        imageio.imwrite(out_path, (out * 255).astype(np.uint8))
        print("wrote", out_path)
    except Exception as e:
        print("image write skipped:", e)
    return out, target[0]


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None,
         sys.argv[2] if len(sys.argv) > 2 else "style_demo_out.png")
