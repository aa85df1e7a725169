"""Golden feature-map test: torch VGG19 -> .pth -> torch-free reader -> Flax.

The reference's content loss is defined by torchvision VGG19 ``features``
activations (``vgg19_feature_model.py:9-58``). torchvision (and its
pretrained download path) is absent here, so the golden is built live: a
torch ``nn.Sequential`` with the exact torchvision ``vgg19().features``
topology and random weights is saved with ``torch.save`` and loaded through
the production path — ``utils.torch_weights.load_state_dict`` (zip + pickle
shim, no torch import) into ``models.vgg.load_torch_vgg19``. Activations of
every tap must match torch to float32 conv tolerance, which pins:

- the .pth zip/pickle reader's tensor reconstruction (strides, dtypes);
- the OIHW -> HWIO kernel conversion and layer indexing (features.{idx});
- the Flax module's architecture (3x3 SAME convs, post-ReLU taps, 2x2 pool
  placement) against torch's.

With real torchvision weights on disk the same path loads them verbatim, so
this is equivalent to a pretrained golden up to the weight values.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _build_torch_vgg19_features(upto_idx: int, seed: int = 0):
    """torchvision ``vgg19().features[:upto_idx]`` topology, random weights."""
    import torch.nn as nn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers = []
    in_ch = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            in_ch = v
    torch.manual_seed(seed)
    model = nn.Sequential(*layers[:upto_idx]).eval()
    return model


# torchvision layer-index -> tap-name map (vgg19_feature_model.py:17-33).
_LAYERS = {1: "conv1_1", 3: "conv1_2", 6: "conv2_1", 8: "conv2_2",
           11: "conv3_1", 13: "conv3_2", 15: "conv3_3", 17: "conv3_4",
           20: "conv4_1", 22: "conv4_2", 24: "conv4_3", 26: "conv4_4"}


@pytest.mark.parametrize("taps", [("conv1_2", "conv2_2"),
                                  ("conv1_1", "conv3_4")])
def test_vgg_feature_maps_match_torch(tmp_path, taps):
    import jax
    import jax.numpy as jnp

    from depth_lidar_nerf_tpu.models.vgg import (VGG19Features,
                                                 load_torch_vgg19)
    from depth_lidar_nerf_tpu.utils.torch_weights import load_state_dict

    last_idx = max(i for i, n in _LAYERS.items() if n == taps[-1]) + 1
    model = _build_torch_vgg19_features(last_idx)

    # Save with torch, reload WITHOUT torch via the production reader.
    pth = tmp_path / "vgg19_random.pth"
    torch.save({f"features.{k}": v for k, v in model.state_dict().items()},
               str(pth))
    sd = load_state_dict(str(pth))
    assert any(k.startswith("features.0.") for k in sd)

    flax_vgg = VGG19Features(taps=taps)
    x = np.random.default_rng(1).normal(size=(2, 32, 40, 3)).astype(np.float32)
    params = flax_vgg.init(jax.random.key(0), jnp.asarray(x))
    params = load_torch_vgg19(params, sd)
    got = flax_vgg.apply(params, jnp.asarray(x))

    # Torch golden activations at every tap.
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        want = {}
        for idx, layer in enumerate(model):
            t = layer(t)
            if idx in _LAYERS and _LAYERS[idx] in taps:
                want[_LAYERS[idx]] = t.numpy().transpose(0, 2, 3, 1)

    assert set(got) == set(want) == set(taps)
    for name in taps:
        np.testing.assert_allclose(np.asarray(got[name]), want[name],
                                   rtol=2e-4, atol=2e-4)


def _build_torch_squeezenet_features(seed: int = 0):
    """torchvision ``squeezenet1_1().features`` topology, random weights."""
    import torch.nn as nn

    class Fire(nn.Module):
        def __init__(self, cin, s, e):
            super().__init__()
            self.squeeze = nn.Conv2d(cin, s, 1)
            self.expand1x1 = nn.Conv2d(s, e, 1)
            self.expand3x3 = nn.Conv2d(s, e, 3, padding=1)

        def forward(self, x):
            x = torch.relu(self.squeeze(x))
            return torch.cat([torch.relu(self.expand1x1(x)),
                              torch.relu(self.expand3x3(x))], 1)

    torch.manual_seed(seed)
    pool = lambda: nn.MaxPool2d(3, 2, ceil_mode=True)  # noqa: E731
    return nn.Sequential(
        nn.Conv2d(3, 64, 3, stride=2), nn.ReLU(), pool(),
        Fire(64, 16, 64), Fire(128, 16, 64), pool(),
        Fire(128, 32, 128), Fire(256, 32, 128), pool(),
        Fire(256, 48, 192), Fire(384, 48, 192),
        Fire(384, 64, 256), Fire(512, 64, 256)).eval()


# features idx -> LPIPS tap (the lpips package's 7 squeeze slice ends).
_SQUEEZE_TAP_IDX = {1: "relu1", 4: "relu2", 7: "relu3", 9: "relu4",
                    10: "relu5", 11: "relu6", 12: "relu7"}


def test_lpips_squeeze_feature_maps_match_torch(tmp_path):
    """Golden for the SqueezeNet LPIPS backbone: pins the VALID-padded s2
    stem, the ceil-mode 3x3/s2 max-pools (odd sizes chosen so ceil-mode
    actually pads), Fire concat order, and the 7 tap locations against a
    live-torch squeezenet1_1 ``features`` with random weights, loaded
    through the production .pth reader + converter."""
    import jax
    import jax.numpy as jnp

    from depth_lidar_nerf_tpu.models.lpips import (LPIPS, SqueezeNetFeatures,
                                                   load_torch_lpips)
    from depth_lidar_nerf_tpu.utils.torch_weights import load_state_dict

    model = _build_torch_squeezenet_features()
    sd = {f"net.features.{k}": v for k, v in model.state_dict().items()}
    torch.manual_seed(1)
    for i, c in enumerate([64, 128, 256, 384, 384, 512, 512]):
        sd[f"lins.{i}.model.1.weight"] = torch.randn(1, c, 1, 1).abs()
    pth = tmp_path / "lpips_squeeze_random.pth"
    torch.save(sd, str(pth))

    # 37x41: after the stem, both dims make the ceil-mode pools pad.
    x = np.random.default_rng(2).normal(size=(2, 37, 41, 3)).astype(np.float32)
    lp = LPIPS(backbone="squeeze")
    params = lp.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(x))
    params = load_torch_lpips(params, load_state_dict(str(pth)),
                              backbone="squeeze")
    got = SqueezeNetFeatures().apply(
        {"params": params["params"]["backbone"]}, jnp.asarray(x))

    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        want = {}
        for idx, layer in enumerate(model):
            t = layer(t)
            if idx in _SQUEEZE_TAP_IDX:
                want[_SQUEEZE_TAP_IDX[idx]] = t.numpy().transpose(0, 2, 3, 1)

    assert set(got) == set(want)
    for name, w in want.items():
        assert got[name].shape == w.shape, name
        np.testing.assert_allclose(np.asarray(got[name]), w,
                                   rtol=2e-4, atol=2e-4)


def test_lpips_conv_weights_roundtrip_through_pth(tmp_path):
    """LPIPS linear-head weights: torch .pth -> torch-free reader -> numpy."""
    from depth_lidar_nerf_tpu.utils.torch_weights import load_state_dict

    torch.manual_seed(3)
    lin = {f"lin{i}.model.1.weight": torch.randn(1, c, 1, 1)
           for i, c in enumerate([64, 128, 256, 512, 512])}
    pth = tmp_path / "lpips_random.pth"
    torch.save(lin, str(pth))
    sd = load_state_dict(str(pth))
    for k, v in lin.items():
        np.testing.assert_allclose(np.asarray(sd[k]), v.numpy(), rtol=0,
                                    atol=0)
