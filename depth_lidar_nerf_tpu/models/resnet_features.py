"""Truncated ResNet-18 feature extractor (alternative perceptual backbone).

Parity: ``external_models_resnet.py:17-40`` — torchvision resnet18 cut at a
named layer, used as a drop-in alternative to VGG19 for the content loss.
Flax/NHWC; weights convertible from a torchvision state_dict.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Explicit torch-style padding: "SAME" aligns stride-2 3x3 windows
        # differently from torch's pad=1 on even-sized inputs, which would
        # break torchvision-weight parity at every downsampling block.
        conv = lambda f, k, s, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s), padding=((k // 2, k // 2),) * 2,
            use_bias=False, dtype=self.dtype, name=name)
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


def load_torch_resnet18(variables, state_dict) -> dict:
    """Copy a torchvision ``resnet18()`` state_dict into a ResNet18Features
    variable tree (``{"params", "batch_stats"}``).

    Torch conv kernels are OIHW (Flax wants HWIO); torch BatchNorm
    weight/bias/running_mean/running_var map to Flax scale/bias and the
    batch_stats mean/var. Only the modules present in ``variables`` (the
    truncated network) are filled, mirroring the reference's cut-at-layer
    model (``external_models_resnet.py:17-40``).
    """
    import copy

    out = copy.deepcopy(flax_unfreeze(variables))
    params, stats = out["params"], out["batch_stats"]

    def put_conv(tree, key):
        w = np.asarray(state_dict[f"{key}.weight"])  # [O, I, kH, kW]
        tree["kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))

    def bn_into(p_tree, s_tree, torch_key):
        p_tree["scale"] = jnp.asarray(np.asarray(state_dict[f"{torch_key}.weight"]))
        p_tree["bias"] = jnp.asarray(np.asarray(state_dict[f"{torch_key}.bias"]))
        s_tree["mean"] = jnp.asarray(
            np.asarray(state_dict[f"{torch_key}.running_mean"]))
        s_tree["var"] = jnp.asarray(
            np.asarray(state_dict[f"{torch_key}.running_var"]))

    put_conv(params["stem"], "conv1")
    bn_into(params["stem_bn"], stats["stem_bn"], "bn1")

    for li in range(1, 5):
        for bi in range(2):
            mod = f"layer{li}_{bi}"
            if mod not in params:
                continue
            tk = f"layer{li}.{bi}"
            put_conv(params[mod]["conv1"], f"{tk}.conv1")
            put_conv(params[mod]["conv2"], f"{tk}.conv2")
            bn_into(params[mod]["bn1"], stats[mod]["bn1"], f"{tk}.bn1")
            bn_into(params[mod]["bn2"], stats[mod]["bn2"], f"{tk}.bn2")
            if "proj" in params[mod]:
                put_conv(params[mod]["proj"], f"{tk}.downsample.0")
                bn_into(params[mod]["bn_proj"], stats[mod]["bn_proj"],
                        f"{tk}.downsample.1")
    return out


def flax_unfreeze(tree):
    import flax

    return flax.core.unfreeze(tree)  # FrozenDict or plain dict -> plain dict
