"""LPIPS perceptual distance in Flax (AlexNet / VGG16 / SqueezeNet backbones).

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


def _ceil_max_pool(x, k: int = 3, s: int = 2):
    """torch ``MaxPool2d(k, s, ceil_mode=True)``: when the last stride-``s``
    window would start in-bounds but overrun the edge, torch keeps it and
    pools the in-bounds values — emulated by -inf right/bottom padding."""
    ph = max(0, -((x.shape[1] - k) // -s) * s + k - x.shape[1])
    pw = max(0, -((x.shape[2] - k) // -s) * s + k - x.shape[2])
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (k, k), strides=(s, s))


class Fire(nn.Module):
    """SqueezeNet Fire: 1x1 squeeze -> relu -> parallel 1x1/3x3 expands,
    relu'd and channel-concatenated (expand1x1 first, like torchvision)."""

    squeeze_ch: int
    expand_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = nn.relu(nn.Conv(self.squeeze_ch, (1, 1), dtype=self.dtype,
                            name="squeeze")(x))
        e1 = nn.relu(nn.Conv(self.expand_ch, (1, 1), dtype=self.dtype,
                             name="expand1x1")(s))
        e3 = nn.relu(nn.Conv(self.expand_ch, (3, 3),
                             padding=((1, 1), (1, 1)), dtype=self.dtype,
                             name="expand3x3")(s))
        return jnp.concatenate([e1, e3], axis=-1)


# torchvision squeezenet1_1 ``features`` indices of the Fire modules and
# their (squeeze, expand) channel plan; modules are named ``fire_{idx}`` so
# the torch converter can address them by index.
_SQUEEZE_FIRES = ((3, 16, 64), (4, 16, 64), (6, 32, 128), (7, 32, 128),
                  (9, 48, 192), (10, 48, 192), (11, 64, 256), (12, 64, 256))


class SqueezeNetFeatures(nn.Module):
    """SqueezeNet1.1 conv trunk returning the 7 LPIPS taps.

    Backbone of ``lpips.LPIPS(net='squeeze')`` (reference ``run_nerf.py:1242``
    accepts net=alex|vgg|squeeze): 3x3/s2 stem, ceil-mode 3x3/s2 max-pools,
    eight Fire modules; taps at the lpips package's 7 slice boundaries
    (after features idx 1, 4, 7, 9, 10, 11, 12)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        taps = {}
        fires = {idx: Fire(sq, ex, dtype=self.dtype, name=f"fire_{idx}")
                 for idx, sq, ex in _SQUEEZE_FIRES}
        x = nn.relu(nn.Conv(64, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name="conv1")(x))
        taps["relu1"] = x
        x = fires[4](fires[3](_ceil_max_pool(x)))
        taps["relu2"] = x
        x = fires[7](fires[6](_ceil_max_pool(x)))
        taps["relu3"] = x
        x = fires[9](_ceil_max_pool(x))
        taps["relu4"] = x
        x = fires[10](x)
        taps["relu5"] = x
        x = fires[11](x)
        taps["relu6"] = x
        taps["relu7"] = fires[12](x)
        return taps


SQUEEZE_TAP_CHANNELS = {"relu1": 64, "relu2": 128, "relu3": 256,
                        "relu4": 384, "relu5": 384, "relu6": 512,
                        "relu7": 512}

_BACKBONES = {
    "alex": (AlexNetFeatures, ALEX_TAP_CHANNELS),
    "vgg": (VGG16Features, VGG_TAP_CHANNELS),
    "squeeze": (SqueezeNetFeatures, SQUEEZE_TAP_CHANNELS),
}


class LPIPS(nn.Module):
    """LPIPS distance (``backbone`` = 'alex', 'vgg', or 'squeeze'). Inputs
    NHWC in [0, 1] (``normalize=True`` semantics of the lpips package) or
    [-1, 1] with ``normalize=False``."""

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

    return model, abs_lin_heads(params)


def abs_lin_heads(params):
    """Ensure the metric is non-negative with arbitrary init: abs of the LIN
    HEAD weights only (torch lpips trains them non-negative; converted torch
    heads are already non-negative so this is a no-op for them). The backbone
    conv weights must keep their signs."""

    def _abs(path, x):
        in_lin = any(str(getattr(k, "key", "")).startswith("lin_")
                     for k in path)
        return jnp.abs(x) if in_lin else x

    return jax.tree_util.tree_map_with_path(_abs, params)


# torchvision `features` module indices of the tapped convs per backbone.
_TORCH_CONV_IDX = {
    "alex": (("conv1", 0), ("conv2", 3), ("conv3", 6), ("conv4", 8),
             ("conv5", 10)),
    "vgg": (("conv1_1", 0), ("conv1_2", 2), ("conv2_1", 5), ("conv2_2", 7),
            ("conv3_1", 10), ("conv3_2", 12), ("conv3_3", 14),
            ("conv4_1", 17), ("conv4_2", 19), ("conv4_3", 21),
            ("conv5_1", 24), ("conv5_2", 26), ("conv5_3", 28)),
}


def _find_by_suffix(state_dict, suffix: str):
    """Fetch a tensor whose key ends with ``suffix`` — tolerant of both the
    lpips package's ``net.slice{n}.{idx}...`` and torchvision's
    ``net.features.{idx}...`` naming (the module index is preserved in
    both)."""
    for k in state_dict:
        if k.endswith(suffix):
            return np.asarray(state_dict[k])
    raise KeyError(f"no state_dict key ends with {suffix!r}")


def load_torch_lpips(params, state_dict, backbone: str = "alex") -> dict:
    """Convert a torch ``lpips.LPIPS(net='alex'|'vgg'|'squeeze')``
    state_dict."""
    import copy

    out = copy.deepcopy(jax.device_get(params))
    p = out["params"]

    def set_conv(tree_node, suffix_base):
        w = _find_by_suffix(state_dict, f"{suffix_base}.weight")
        tree_node["kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))
        tree_node["bias"] = jnp.asarray(
            _find_by_suffix(state_dict, f"{suffix_base}.bias"))

    if backbone == "squeeze":
        set_conv(p["backbone"]["conv1"], ".0")
        for idx, _, _ in _SQUEEZE_FIRES:
            fire = p["backbone"][f"fire_{idx}"]
            for sub in ("squeeze", "expand1x1", "expand3x3"):
                set_conv(fire[sub], f".{idx}.{sub}")
    else:
        for name, idx in _TORCH_CONV_IDX[backbone]:
            set_conv(p["backbone"][name], f".{idx}")
    for i, tap in enumerate(_BACKBONES[backbone][1]):
        w = np.asarray(state_dict[f"lins.{i}.model.1.weight"])  # [1, C, 1, 1]
        p[f"lin_{tap}"]["kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))
    return out
