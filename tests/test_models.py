"""NeRF MLP / discriminator structural and parity tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from depth_lidar_nerf_tpu.models import NeRFMLP, ESRDiscriminator
from depth_lidar_nerf_tpu.ops.embedding import embedding_dim


def _init(model, pts_dim, views_dim, n=4):
    pe = jnp.zeros((n, pts_dim))
    ve = jnp.zeros((n, views_dim)) if views_dim else None
    params = model.init(jax.random.key(0), pe, ve)
    return params, pe, ve


def test_nerf_mlp_output_layout():
    pts_dim = embedding_dim(3, 10)  # 63
    views_dim = embedding_dim(3, 4)  # 27
    model = NeRFMLP(depth=4, width=256, in_channels=pts_dim,
                    in_channels_views=views_dim, num_semantic_classes=7)
    params, pe, ve = _init(model, pts_dim, views_dim)
    out = model.apply(params, pe, ve)
    assert out.shape == (4, 4 + 7)  # rgb(3) + sigma(1) + semantic(7)


def test_nerf_mlp_skip_layer_shapes():
    """With depth=8, skips=(4,), trunk layer 5 consumes W + in_channels
    (run_nerf_helpers.py:90-91); with depth=4 no skip is live."""
    pts_dim = 63
    m8 = NeRFMLP(depth=8, width=256, in_channels=pts_dim, in_channels_views=27)
    p8, _, _ = _init(m8, pts_dim, 27)
    k = p8["params"]["trunk_5"]["kernel"]
    assert k.shape[0] == 256 + pts_dim

    m4 = NeRFMLP(depth=4, width=256, in_channels=pts_dim, in_channels_views=27)
    p4, _, _ = _init(m4, pts_dim, 27)
    for i in range(1, 4):
        assert p4["params"][f"trunk_{i}"]["kernel"].shape[0] == 256


def test_nerf_mlp_sigma_ignores_viewdirs():
    """Density must be a function of position only (trunk head)."""
    pts_dim, views_dim = 63, 27
    model = NeRFMLP(depth=4, width=64, in_channels=pts_dim, in_channels_views=views_dim)
    pe = jax.random.normal(jax.random.key(1), (8, pts_dim))
    params = model.init(jax.random.key(0), pe, jnp.zeros((8, views_dim)))
    out_a = model.apply(params, pe, jax.random.normal(jax.random.key(2), (8, views_dim)))
    out_b = model.apply(params, pe, jax.random.normal(jax.random.key(3), (8, views_dim)))
    np.testing.assert_allclose(out_a[..., 3], out_b[..., 3], rtol=1e-6)
    assert not np.allclose(out_a[..., :3], out_b[..., :3])


def test_nerf_mlp_frozen_sigma_substitution():
    """NeRF_RGB behaviour (run_nerf_helpers.py:216-218): external density."""
    pts_dim, views_dim = 63, 27
    model = NeRFMLP(depth=2, width=32, in_channels=pts_dim, in_channels_views=views_dim)
    pe = jax.random.normal(jax.random.key(1), (5, pts_dim))
    ve = jnp.zeros((5, views_dim))
    params = model.init(jax.random.key(0), pe, ve)
    frozen = jnp.full((5, 1), 3.25)
    out = model.apply(params, pe, ve, frozen_sigma=frozen)
    np.testing.assert_allclose(np.asarray(out[..., 3]), 3.25, rtol=1e-6)


def test_nerf_mlp_no_viewdirs_path():
    model = NeRFMLP(depth=2, width=32, in_channels=63, use_viewdirs=False, output_ch=4)
    pe = jnp.zeros((4, 63))
    params = model.init(jax.random.key(0), pe, None)
    assert model.apply(params, pe, None).shape == (4, 4)


def test_nerf_mlp_bf16_compute_fp32_params():
    model = NeRFMLP(depth=2, width=32, in_channels=63, in_channels_views=27,
                    dtype=jnp.bfloat16)
    pe = jnp.zeros((4, 63))
    ve = jnp.zeros((4, 27))
    params = model.init(jax.random.key(0), pe, ve)
    assert params["params"]["trunk_0"]["kernel"].dtype == jnp.float32
    assert model.apply(params, pe, ve).dtype == jnp.bfloat16


@pytest.mark.parametrize("H,W", [(32, 32), (64, 192)])
def test_esr_discriminator_shapes(H, W):
    disc = ESRDiscriminator()
    x = jnp.zeros((2, H, W, 3))
    params = disc.init(jax.random.key(0), x)
    out = disc.apply(params, x)
    assert out.shape == (2, 1)
