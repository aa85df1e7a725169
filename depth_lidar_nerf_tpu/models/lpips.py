"""LPIPS perceptual distance in Flax (AlexNet / VGG16 backbones).

Role of the reference's two LPIPS consumers: the ``lpips`` pip package used
as a train-time feature loss and test metric (``run_nerf.py:1240-1246,1316``)
and the frozen TF1 AlexNet graph in offline eval (``eval_utils.py:122-147`` —
that binary is absent from the reference checkout). Implements the LPIPS
recipe: backbone conv features at the canonical taps, channel-unit-normalize,
squared difference, 1x1 linear head per tap, spatial mean, sum over taps.

Weights: ``load_torch_lpips`` converts a torch ``lpips`` state_dict (backbone
+ lin heads) when a file is available; otherwise fixed-seed init — still a
deterministic perceptual metric for relative comparisons, with absolute
parity restored by dropping weights in.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# LPIPS input normalization (the lpips package's scaling layer).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class AlexNetFeatures(nn.Module):
    """AlexNet conv trunk returning the 5 LPIPS taps (relu1..relu5)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        taps = {}
        conv = lambda f, k, s, p, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s), padding=((p, p), (p, p)),
            dtype=self.dtype, name=name)
        x = nn.relu(conv(64, 11, 4, 2, "conv1")(x))
        taps["relu1"] = x
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(conv(192, 5, 1, 2, "conv2")(x))
        taps["relu2"] = x
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(conv(384, 3, 1, 1, "conv3")(x))
        taps["relu3"] = x
        x = nn.relu(conv(256, 3, 1, 1, "conv4")(x))
        taps["relu4"] = x
        x = nn.relu(conv(256, 3, 1, 1, "conv5")(x))
        taps["relu5"] = x
        return taps


ALEX_TAP_CHANNELS = {"relu1": 64, "relu2": 192, "relu3": 384, "relu4": 256,
                     "relu5": 256}


class VGG16Features(nn.Module):
    """VGG16 conv trunk returning the 5 LPIPS taps (relu1_2..relu5_3).

    Backbone of ``lpips.LPIPS(net='vgg')`` (reference ``run_nerf.py:1242``
    accepts net=alex|vgg|squeeze): 3x3/pad-1 convs, 2x2 max-pools between
    blocks, taps after the last relu of each block."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        taps = {}
        plan = [  # (n_convs, channels, tap name)
            (2, 64, "relu1"), (2, 128, "relu2"), (3, 256, "relu3"),
            (3, 512, "relu4"), (3, 512, "relu5")]
        for bi, (n_convs, ch, tap) in enumerate(plan, start=1):
            if bi > 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for ci in range(1, n_convs + 1):
                x = nn.relu(nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                                    dtype=self.dtype,
                                    name=f"conv{bi}_{ci}")(x))
            taps[tap] = x
        return taps


VGG_TAP_CHANNELS = {"relu1": 64, "relu2": 128, "relu3": 256, "relu4": 512,
                    "relu5": 512}

_BACKBONES = {
    "alex": (AlexNetFeatures, ALEX_TAP_CHANNELS),
    "vgg": (VGG16Features, VGG_TAP_CHANNELS),
}


class LPIPS(nn.Module):
    """LPIPS distance (``backbone`` = 'alex' or 'vgg'). Inputs NHWC in [0, 1]
    (``normalize=True`` semantics of the lpips package) or [-1, 1] with
    ``normalize=False``."""

    spatial: bool = False
    backbone: str = "alex"

    @nn.compact
    def __call__(self, img0, img1, normalize: bool = True):
        if normalize:  # [0,1] -> [-1,1]
            img0 = img0 * 2.0 - 1.0
            img1 = img1 * 2.0 - 1.0
        img0 = (img0 - _SHIFT) / _SCALE
        img1 = (img1 - _SHIFT) / _SCALE

        net_cls, tap_channels = _BACKBONES[self.backbone]
        net = net_cls(name="backbone")
        f0, f1 = net(img0), net(img1)

        total = 0.0
        for tap, ch in tap_channels.items():
            a = _unit_normalize(f0[tap])
            b = _unit_normalize(f1[tap])
            d = (a - b) ** 2  # [B, h, w, C]
            lin = nn.Conv(1, (1, 1), use_bias=False, name=f"lin_{tap}")
            d = lin(d)  # [B, h, w, 1]
            if self.spatial:
                d = jax.image.resize(d, img0.shape[:3] + (1,), "bilinear")
                total = total + d
            else:
                total = total + jnp.mean(d, axis=(1, 2, 3))
        return total


def _unit_normalize(x, eps=1e-10):
    n = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (n + eps)


def init_lpips(rng: jax.Array, H: int = 64, W: int = 64,
               weights_path: str | None = None, backbone: str = "alex"):
    """Build (module, params); loads converted torch weights when given."""
    model = LPIPS(backbone=backbone)
    x = jnp.zeros((1, H, W, 3))
    params = model.init(rng, x, x)
    if weights_path:
        from depth_lidar_nerf_tpu.utils.torch_weights import load_state_dict

        params = load_torch_lpips(params, load_state_dict(weights_path),
                                  backbone=backbone)
    # Ensure the metric is non-negative with arbitrary init: square of lin
    # weights (torch lpips trains them non-negative).
    params = jax.tree.map(jnp.abs, params)
    return model, params


# torchvision `features` module indices of the tapped convs per backbone.
_TORCH_CONV_IDX = {
    "alex": (("conv1", 0), ("conv2", 3), ("conv3", 6), ("conv4", 8),
             ("conv5", 10)),
    "vgg": (("conv1_1", 0), ("conv1_2", 2), ("conv2_1", 5), ("conv2_2", 7),
            ("conv3_1", 10), ("conv3_2", 12), ("conv3_3", 14),
            ("conv4_1", 17), ("conv4_2", 19), ("conv4_3", 21),
            ("conv5_1", 24), ("conv5_2", 26), ("conv5_3", 28)),
}


def load_torch_lpips(params, state_dict, backbone: str = "alex") -> dict:
    """Convert a torch ``lpips.LPIPS(net='alex'|'vgg')`` state_dict."""
    import copy

    out = copy.deepcopy(jax.device_get(params))
    p = out["params"]
    for name, idx in _TORCH_CONV_IDX[backbone]:
        w = np.asarray(state_dict[f"net.slice_or_features.{idx}.weight"]
                       if f"net.slice_or_features.{idx}.weight" in state_dict
                       else state_dict[f"net.features.{idx}.weight"])
        b_key = (f"net.slice_or_features.{idx}.bias"
                 if f"net.slice_or_features.{idx}.bias" in state_dict
                 else f"net.features.{idx}.bias")
        p["backbone"][name]["kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))
        p["backbone"][name]["bias"] = jnp.asarray(np.asarray(state_dict[b_key]))
    for i, tap in enumerate(_BACKBONES[backbone][1]):
        w = np.asarray(state_dict[f"lins.{i}.model.1.weight"])  # [1, C, 1, 1]
        p[f"lin_{tap}"]["kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))
    return out
