"""Torch-free .pth reader: golden parity against torch.save output.

The reference's perceptual losses are defined by torch-pretrained weights
(vgg19_feature_model.py:9-24); utils/torch_weights.py must read real torch
zip checkpoints bit-for-bit without importing torch.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from depth_lidar_nerf_tpu.utils.torch_weights import load_state_dict  # noqa: E402


def _roundtrip(tmp_path, tensors):
    path = str(tmp_path / "ckpt.pth")
    torch.save(tensors, path)
    return load_state_dict(path)


def test_zip_state_dict_roundtrip(tmp_path):
    g = torch.Generator().manual_seed(0)
    sd = {
        "features.0.weight": torch.randn(8, 3, 3, 3, generator=g),
        "features.0.bias": torch.randn(8, generator=g),
        "fc.weight": torch.randn(4, 8, generator=g, dtype=torch.float64),
        "counts": torch.arange(10, dtype=torch.int64),
    }
    out = _roundtrip(tmp_path, sd)
    assert set(out) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(out[k], sd[k].numpy())
        assert out[k].dtype == sd[k].numpy().dtype


def test_bfloat16_and_half(tmp_path):
    g = torch.Generator().manual_seed(1)
    sd = {
        "w_bf16": torch.randn(5, 7, generator=g).to(torch.bfloat16),
        "w_f16": torch.randn(5, 7, generator=g).to(torch.float16),
    }
    out = _roundtrip(tmp_path, sd)
    np.testing.assert_array_equal(out["w_bf16"],
                                  sd["w_bf16"].float().numpy())
    np.testing.assert_array_equal(out["w_f16"],
                                  sd["w_f16"].numpy())


def test_noncontiguous_and_scalar(tmp_path):
    base = torch.arange(24, dtype=torch.float32).reshape(4, 6)
    sd = {"t": base.t(), "scalar": torch.tensor(3.5)}  # transposed view
    out = _roundtrip(tmp_path, sd)
    np.testing.assert_array_equal(out["t"], base.t().numpy())
    assert float(out["scalar"]) == 3.5


def test_nested_state_dict_key(tmp_path):
    sd = {"state_dict": {"a": torch.ones(3)}}
    out = _roundtrip(tmp_path, sd)
    np.testing.assert_array_equal(out["a"], np.ones(3, np.float32))


def test_refuses_arbitrary_classes(tmp_path):
    import pickle
    import zipfile

    path = str(tmp_path / "evil.pth")
    with zipfile.ZipFile(path, "w") as zf:
        # A pickle that references an arbitrary callable by module.name.
        zf.writestr("archive/data.pkl", pickle.dumps(zipfile.ZipFile))
    with pytest.raises(Exception, match="refusing|unpickl"):
        load_state_dict(path)


def test_lpips_converter_accepts_numpy(tmp_path):
    """The LPIPS/VGG converters consume the torch-free reader's output."""
    import jax

    from depth_lidar_nerf_tpu.models.lpips import (
        ALEX_TAP_CHANNELS, LPIPS, load_torch_lpips)

    model = LPIPS()
    x = np.zeros((1, 32, 32, 3), np.float32)  # AlexNet taps need >=31 px
    params = model.init(jax.random.key(0), x, x)

    alex_idx = [0, 3, 6, 8, 10]
    chans = list(ALEX_TAP_CHANNELS.values())
    in_ch = [3] + chans[:-1]
    ksize = [11, 5, 3, 3, 3]
    g = torch.Generator().manual_seed(2)
    sd = {}
    for idx, ci, co, k in zip(alex_idx, in_ch, chans, ksize):
        sd[f"net.features.{idx}.weight"] = torch.randn(co, ci, k, k, generator=g)
        sd[f"net.features.{idx}.bias"] = torch.randn(co, generator=g)
    for i, ch in enumerate(chans):
        sd[f"lins.{i}.model.1.weight"] = torch.randn(1, ch, 1, 1,
                                                     generator=g).abs()
    path = str(tmp_path / "lpips.pth")
    torch.save(sd, path)
    loaded = load_torch_lpips(params, load_state_dict(path))
    got = np.asarray(loaded["params"]["backbone"]["conv1"]["kernel"])
    want = sd["net.features.0.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(got, want)
    # the loaded params still run
    d = model.apply(loaded, x, x)
    assert float(d[0]) == 0.0
