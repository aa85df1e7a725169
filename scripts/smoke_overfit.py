"""Drive: overfit a tiny NeRF on a synthetic scene through the public API, on TPU."""
import time
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np, optax

from depth_lidar_nerf_tpu.models import NeRFMLP
from depth_lidar_nerf_tpu.ops.embedding import embedding_dim
from depth_lidar_nerf_tpu.render import RenderConfig, make_rays, render_rays, render_image
from depth_lidar_nerf_tpu.ops.rays import camera_rays

print("devices:", jax.devices())

H, W, focal = 24, 24, 24.0
c2w = jnp.eye(4)[:3]
cfg = RenderConfig(N_samples=32, N_importance=32, perturb=True, raw_noise_std=0.0,
                   ndc=False, near=2.0, far=6.0, multires=6, multires_views=2)

# Synthetic target: a colored gradient image.
yy, xx = np.meshgrid(np.linspace(0,1,H), np.linspace(0,1,W), indexing="ij")
target = jnp.asarray(np.stack([xx, yy, 0.5*np.ones_like(xx)], -1), jnp.float32)

ro, rd = camera_rays(H, W, focal, c2w)
rays = make_rays(ro.reshape(-1,3), rd.reshape(-1,3), cfg)
tgt = target.reshape(-1,3)

pd, vd = embedding_dim(3, cfg.multires), embedding_dim(3, cfg.multires_views)
coarse = NeRFMLP(depth=4, width=64, in_channels=pd, in_channels_views=vd)
fine = NeRFMLP(depth=4, width=64, in_channels=pd, in_channels_views=vd)
pe, ve = jnp.zeros((1,pd)), jnp.zeros((1,vd))
params = {"coarse": coarse.init(jax.random.key(0), pe, ve),
          "fine": fine.init(jax.random.key(1), pe, ve)}

opt = optax.adam(5e-4)
opt_state = opt.init(params)

@jax.jit
def step(params, opt_state, rng):
    def loss_fn(p):
        out = render_rays(coarse, fine, p, rays, cfg, rng=rng)
        l = jnp.mean((out["rgb_map"]-tgt)**2) + jnp.mean((out["rgb0"]-tgt)**2)
        return l, jnp.mean((out["rgb_map"]-tgt)**2)
    (l, mse), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
    upd, opt_state = opt.update(g, opt_state)
    return optax.apply_updates(params, upd), opt_state, mse

t0=time.time()
for i in range(301):
    params, opt_state, mse = step(params, opt_state, jax.random.key(i))
    if i in (0, 50, 150, 300):
        psnr = -10*np.log10(float(mse))
        print(f"step {i:4d}  mse {float(mse):.5f}  psnr {psnr:.2f} dB  ({time.time()-t0:.1f}s)")

img = render_image(coarse, fine, params, H, W, focal, c2w, cfg, tile=256)
final = float(jnp.mean((img["rgb_map"]-target)**2))
print("render_image psnr:", -10*np.log10(final), "shape:", img["rgb_map"].shape,
      "depth range:", float(img["depth_map"].min()), float(img["depth_map"].max()))
