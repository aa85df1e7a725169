"""VGG19 feature extractor for the content (perceptual) loss, in Flax.

Parity target: ``vgg19_feature_model.py:9-64`` — torchvision VGG19 ``features``
truncated at the deepest requested tap, returning a dict of post-ReLU
activations named ``conv{block}_{idx}`` exactly as the reference's layer map
(``vgg19_feature_model.py:17-33``).

Weights: the environment has no torchvision download path, so pretrained
weights are loaded from a torch ``state_dict`` file when available
(``load_torch_vgg19``); otherwise the module runs with its own initialization
(still a valid perceptual prior for relative experiments, and the conversion
path is round-trip tested against torch's conv semantics).

Tensors are NHWC float32. Convolutions are 3x3 SAME, max-pool 2x2 between
blocks — the big 3x3 convs on patch inputs are MXU work once XLA lowers them.
"""

from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# VGG19 topology: (block, n_convs, filters)
_VGG19_BLOCKS = ((1, 2, 64), (2, 2, 128), (3, 4, 256), (4, 4, 512), (5, 4, 512))

#: All tap names in forward order, e.g. "conv1_1", ..., "conv5_4".
VGG19_TAPS = tuple(
    f"conv{b}_{i + 1}" for b, n, _ in _VGG19_BLOCKS for i in range(n)
)

# ImageNet normalization used by the reference (vgg19_feature_model.py:60-64).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def vgg_normalize(images: jnp.ndarray) -> jnp.ndarray:
    """ImageNet-normalize NHWC images in [0, 1]."""
    return (images - IMAGENET_MEAN) / IMAGENET_STD


class VGG19Features(nn.Module):
    """Runs VGG19 up to the deepest layer in ``taps`` and returns those taps."""

    taps: Sequence[str] = ("conv1_2", "conv2_2")
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        wanted = set(self.taps)
        unknown = wanted - set(VGG19_TAPS)
        if unknown:
            raise ValueError(f"unknown VGG19 taps: {sorted(unknown)}")
        last = max(VGG19_TAPS.index(t) for t in self.taps)

        feats: Dict[str, jnp.ndarray] = {}
        tap_i = 0
        for block, n_convs, filters in _VGG19_BLOCKS:
            for ci in range(n_convs):
                x = nn.Conv(
                    filters, (3, 3), padding="SAME", dtype=self.dtype,
                    name=f"conv{block}_{ci + 1}",
                )(x)
                x = nn.relu(x)
                name = VGG19_TAPS[tap_i]
                if name in wanted:
                    feats[name] = x
                if tap_i == last:
                    return feats
                tap_i += 1
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


def load_torch_vgg19(params, state_dict) -> dict:
    """Copy torchvision ``vgg19().features`` weights into a VGG19Features tree.

    ``state_dict`` maps ``features.{idx}.weight/bias`` with OIHW conv kernels;
    Flax wants HWIO. Only the layers present in ``params`` (the truncated
    network) are filled.
    """
    import copy

    # torchvision features indices of the conv layers, in forward order.
    conv_idx = []
    i = 0
    for _, n_convs, _ in _VGG19_BLOCKS:
        for _ in range(n_convs):
            conv_idx.append(i)
            i += 2  # conv, relu
        i += 1  # maxpool

    out = copy.deepcopy(flax_unfreeze(params))
    tree = out["params"] if "params" in out else out
    for name, idx in zip(VGG19_TAPS, conv_idx):
        if name not in tree:
            continue
        w = np.asarray(state_dict[f"features.{idx}.weight"])  # [O, I, 3, 3]
        b = np.asarray(state_dict[f"features.{idx}.bias"])
        tree[name]["kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))  # HWIO
        tree[name]["bias"] = jnp.asarray(b)
    return out


def flax_unfreeze(tree):
    try:  # flax FrozenDict or plain dict
        return tree.unfreeze()
    except AttributeError:
        return dict(tree)
