"""The seven-term loss stack.

Parity targets (all in the reference train loop unless noted):

- RGB MSE + PSNR lambdas: ``run_nerf_helpers.py:19-21``
- LiDAR/COLMAP depth loss variants (weighted / normalized / relative / plain):
  ``run_nerf.py:1503-1524``
- depth-importance decay ``0.1^(step / (lrate_decay * 1000))``:
  ``run_nerf.py:1531-1536``
- DS-NeRF sigma (KL) loss: ``loss.py:8-44`` (note: the reference train loop's
  wiring of this loss is dead code — it reads an undefined ``extras_col``
  at ``run_nerf.py:1527`` — so this is a working re-derivation of the intended
  DS-NeRF behaviour)
- semantic cross-entropy: ``run_nerf.py:1539-1548``
- image-aware inverse-depth smoothness: ``loss.py:55-133``
- VGG feature distance: ``run_nerf.py:1692-1700``
- GAN generator/discriminator MSE criterion: ``run_nerf.py:1263,1729-1816``
- SSIM (train-time metric): ``loss.py:143-212``

All functions are pure jnp and differentiable where the reference
differentiates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def img2mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2)


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def to8b(x: np.ndarray) -> np.ndarray:
    return (255 * np.clip(x, 0, 1)).astype(np.uint8)


def depth_importance(step, lrate_decay: int) -> jnp.ndarray:
    """Exponential decay multiplier on the depth-supervision terms."""
    return 0.1 ** (step / (lrate_decay * 1000.0))


def depth_loss(
    rendered: jnp.ndarray,
    target: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    *,
    weighted: bool = False,
    normalize: bool = False,
    relative: bool = False,
) -> jnp.ndarray:
    """Depth supervision on the rendered expected depth of the depth rays."""
    if weighted:
        if normalize:
            err = ((rendered - target) / jnp.max(target)) ** 2
        else:
            err = (rendered - target) ** 2
        return jnp.mean(err * weights)
    if relative:
        return jnp.mean(((rendered - target) / (target + 1e-16)) ** 2)
    return img2mse(rendered, target)


def sigma_loss_from_sigma(sigma: jnp.ndarray) -> jnp.ndarray:
    """DS-NeRF KL surrogate given post-ReLU sigma sampled on [near, gt_depth].

    ``sigma [N_rays, N_samples]`` where the last sample sits at the LiDAR
    termination depth. Loss per ray: ``-exp(s_last) / (sum exp(s) + 1)``
    (``loss.py:43``) — maximized when all density mass sits at the GT depth.
    Evaluated with a row-max shift so large sigma cannot overflow exp.
    """
    m = jnp.max(sigma, axis=1, keepdims=True)
    num = jnp.exp(sigma[:, -1] - m[:, 0])
    den = jnp.sum(jnp.exp(sigma - m), axis=1) + jnp.exp(-m[:, 0])
    return -num / den


def semantic_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over rays; ``labels`` are int class ids (torch F.cross_entropy)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[..., None], axis=-1))


# --------------------------------------------------------------- smoothness

def _grad_x(img):  # [B, H, W, C]
    return img[:, :, :-1, :] - img[:, :, 1:, :]


def _grad_y(img):
    return img[:, :-1, :, :] - img[:, 1:, :, :]


def inverse_depth_smoothness_loss(depth: jnp.ndarray, image: jnp.ndarray) -> jnp.ndarray:
    """Image-aware smoothness on a rendered patch.

    ``depth [B, H, W, 1]``, ``image [B, H, W, 3]`` (NHWC; the reference is
    NCHW, ``loss.py:55-133``). ``loss = |dx d| e^{-mean|dx I|} +
    |dy d| e^{-mean|dy I|}`` averaged over the patch.
    """
    dx_d, dy_d = _grad_x(depth), _grad_y(depth)
    dx_i, dy_i = _grad_x(image), _grad_y(image)
    wx = jnp.exp(-jnp.mean(jnp.abs(dx_i), axis=-1, keepdims=True))
    wy = jnp.exp(-jnp.mean(jnp.abs(dy_i), axis=-1, keepdims=True))
    return jnp.mean(jnp.abs(dx_d * wx)) + jnp.mean(jnp.abs(dy_d * wy))


# --------------------------------------------------------------------- SSIM

def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    size_average: bool = True,
) -> jnp.ndarray:
    """Gaussian-window SSIM on NHWC images (parity: ``loss.py:143-212``).

    Per-channel (grouped) convolution with an 11x11 sigma=1.5 window and SAME
    padding, C1=0.01^2, C2=0.03^2.
    """
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    channels = img1.shape[-1]
    w = jnp.asarray(_gaussian_window(window_size, 1.5))
    kernel = jnp.tile(w[:, :, None, None], (1, 1, 1, channels))  # HWIO, grouped

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=channels,
        )

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = filt(img1 * img1) - mu1_sq
    sigma2_sq = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu1_mu2

    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))


# ---------------------------------------------------------------------- GAN

def gan_mse(pred: jnp.ndarray, target_value: float) -> jnp.ndarray:
    """The reference's adversarial criterion is plain MSE (run_nerf.py:1263)."""
    return jnp.mean((pred - target_value) ** 2)


def gan_noise_std_at(step, start_std: float) -> jnp.ndarray:
    """Decaying discriminator input-noise std (run_nerf.py:1860-1862)."""
    return start_std * 0.9 ** (step / 5000.0)


# --------------------------------------------------------------- VGG feature

def vgg_feature_distance(feats_a, feats_b, layer_names, layer_weights,
                         loss_type: str = "l2"):
    """Weighted per-layer L1/L2 distance between VGG tap dicts
    (run_nerf.py:1692-1700)."""
    total = 0.0
    for name, w in zip(layer_names, layer_weights):
        d = feats_a[name] - feats_b[name]
        if loss_type == "l1":
            total = total + jnp.mean(jnp.abs(d)) * w
        elif loss_type == "l2":
            total = total + jnp.mean(d**2) * w
        else:
            raise ValueError(f"vgg_loss_type must be l1 or l2, got {loss_type}")
    return total
