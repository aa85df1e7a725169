"""Golden feature-map test: torch resnet18 -> .pth -> torch-free reader -> Flax.

The reference's alternative perceptual backbone is a torchvision resnet18
truncated at a named layer (``external_models_resnet.py:17-40``). torchvision
is absent here, so the golden is built live: the exact resnet18 topology in
raw torch with random weights/running-stats, saved with ``torch.save`` and
loaded through the production path (``utils.torch_weights.load_state_dict``
-> ``models.resnet_features.load_torch_resnet18``). Even-sized inputs are
used deliberately: torch's pad=1 stride-2 3x3 convs align their windows
differently from XLA "SAME" there, so this test pins the explicit-padding
choice in ``BasicBlock`` as well as the converter's key mapping.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


class _TorchBasic(torch.nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        sc = x if self.downsample is None else self.downsample(x)
        return torch.relu(sc + y)


class _TorchResNet18(torch.nn.Module):
    """torchvision ``resnet18()`` trunk (no fc/avgpool), torchvision key names."""

    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = nn.Sequential(_TorchBasic(64, 64, 1), _TorchBasic(64, 64, 1))
        self.layer2 = nn.Sequential(_TorchBasic(64, 128, 2), _TorchBasic(128, 128, 1))
        self.layer3 = nn.Sequential(_TorchBasic(128, 256, 2), _TorchBasic(256, 256, 1))
        self.layer4 = nn.Sequential(_TorchBasic(256, 512, 2), _TorchBasic(512, 512, 1))

    def forward(self, x, upto="layer4"):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for name in ("layer1", "layer2", "layer3", "layer4"):
            x = getattr(self, name)(x)
            if name == upto:
                return x
        return x


def _randomize(model, seed=0):
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.2)
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
    return model.eval()


@pytest.mark.parametrize("layer", ["layer2", "layer4"])
def test_resnet18_feature_maps_match_torch(tmp_path, layer):
    import jax
    import jax.numpy as jnp

    from depth_lidar_nerf_tpu.models.resnet_features import (
        ResNet18Features, load_torch_resnet18)
    from depth_lidar_nerf_tpu.utils.torch_weights import load_state_dict

    model = _randomize(_TorchResNet18())
    pth = tmp_path / "resnet18_random.pth"
    torch.save(model.state_dict(), str(pth))
    sd = load_state_dict(str(pth))

    # 32x40 is even on both dims: stride-2 window alignment is exercised at
    # the stem, the maxpool, and every downsampling block.
    x = np.random.default_rng(1).normal(size=(2, 32, 40, 3)).astype(np.float32)
    net = ResNet18Features(output_layer=layer)
    variables = net.init(jax.random.key(0), jnp.asarray(x))
    variables = load_torch_resnet18(variables, sd)
    got = np.asarray(net.apply(variables, jnp.asarray(x)))

    with torch.no_grad():
        want = model(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                     upto=layer).numpy().transpose(0, 2, 3, 1)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
