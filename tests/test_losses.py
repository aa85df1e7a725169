"""Unit tests for the loss stack against independent oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from depth_lidar_nerf_tpu.train import losses


def test_depth_loss_variants(rng_np):
    """run_nerf.py:1515-1524 formulas."""
    d = rng_np.uniform(1, 5, 64).astype(np.float32)
    t = rng_np.uniform(1, 5, 64).astype(np.float32)
    w = rng_np.uniform(0, 2, 64).astype(np.float32)

    plain = float(losses.depth_loss(jnp.asarray(d), jnp.asarray(t)))
    np.testing.assert_allclose(plain, np.mean((d - t) ** 2), rtol=1e-6)

    weighted = float(losses.depth_loss(jnp.asarray(d), jnp.asarray(t),
                                       jnp.asarray(w), weighted=True))
    np.testing.assert_allclose(weighted, np.mean(((d - t) ** 2) * w), rtol=1e-6)

    norm = float(losses.depth_loss(jnp.asarray(d), jnp.asarray(t),
                                   jnp.asarray(w), weighted=True,
                                   normalize=True))
    np.testing.assert_allclose(norm, np.mean((((d - t) / t.max()) ** 2) * w),
                               rtol=1e-6)

    rel = float(losses.depth_loss(jnp.asarray(d), jnp.asarray(t),
                                  relative=True))
    np.testing.assert_allclose(rel, np.mean(((d - t) / (t + 1e-16)) ** 2),
                               rtol=1e-6)


def test_depth_importance_decay():
    """0.1^(step / (lrate_decay*1000)) (run_nerf.py:1531-1536)."""
    assert float(losses.depth_importance(0, 250)) == 1.0
    np.testing.assert_allclose(float(losses.depth_importance(250000, 250)),
                               0.1, rtol=1e-6)


def test_sigma_loss_prefers_mass_at_depth():
    """loss.py:43: all mass at the GT depth (last sample) minimizes the loss."""
    good = np.full((4, 16), -5.0, np.float32)
    good[:, -1] = 5.0
    bad = np.full((4, 16), -5.0, np.float32)
    bad[:, 3] = 5.0
    l_good = float(jnp.mean(losses.sigma_loss_from_sigma(
        jax.nn.relu(jnp.asarray(good)))))
    l_bad = float(jnp.mean(losses.sigma_loss_from_sigma(
        jax.nn.relu(jnp.asarray(bad)))))
    assert l_good < l_bad


def test_sigma_loss_matches_naive_formula(rng_np):
    """The max-shifted form equals -exp(s_N)/(sum exp(s)+1) exactly."""
    s = rng_np.uniform(0, 5, (8, 12)).astype(np.float32)
    got = np.asarray(losses.sigma_loss_from_sigma(jnp.asarray(s)))
    # direct per-ray values
    want = -np.exp(s[:, -1]) / (np.exp(s).sum(1) + 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_semantic_cross_entropy_matches_torch(rng_np):
    torch = pytest.importorskip("torch")
    logits = rng_np.standard_normal((32, 7)).astype(np.float32)
    labels = rng_np.integers(0, 7, 32)
    got = float(losses.semantic_cross_entropy(jnp.asarray(logits),
                                              jnp.asarray(labels)))
    want = float(torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_inverse_depth_smoothness_oracle(rng_np):
    """loss.py:119-133 formula, NHWC."""
    d = rng_np.uniform(0, 1, (2, 6, 8, 1)).astype(np.float32)
    img = rng_np.uniform(0, 1, (2, 6, 8, 3)).astype(np.float32)
    got = float(losses.inverse_depth_smoothness_loss(jnp.asarray(d),
                                                     jnp.asarray(img)))
    dx_d = d[:, :, :-1] - d[:, :, 1:]
    dy_d = d[:, :-1] - d[:, 1:]
    dx_i = img[:, :, :-1] - img[:, :, 1:]
    dy_i = img[:, :-1] - img[:, 1:]
    wx = np.exp(-np.abs(dx_i).mean(-1, keepdims=True))
    wy = np.exp(-np.abs(dy_i).mean(-1, keepdims=True))
    want = np.abs(dx_d * wx).mean() + np.abs(dy_d * wy).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ssim_matches_torch_reference(rng_np):
    """loss.py:143-212 (Gaussian-window SSIM) vs a torch reimplementation."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    a = rng_np.uniform(0, 1, (1, 24, 24, 3)).astype(np.float32)
    b = np.clip(a + rng_np.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)

    got = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))

    # torch oracle (NCHW)
    at = torch.from_numpy(a.transpose(0, 3, 1, 2))
    bt = torch.from_numpy(b.transpose(0, 3, 1, 2))
    g = torch.tensor([np.exp(-((i - 5) ** 2) / (2 * 1.5 ** 2))
                      for i in range(11)])
    g = (g / g.sum()).float()
    win = (g[:, None] @ g[None, :]).expand(3, 1, 11, 11).contiguous()

    def filt(x):
        return F.conv2d(x, win, padding=5, groups=3)

    mu1, mu2 = filt(at), filt(bt)
    s11 = filt(at * at) - mu1 ** 2
    s22 = filt(bt * bt) - mu2 ** 2
    s12 = filt(at * bt) - mu1 * mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    want = (((2 * mu1 * mu2 + C1) * (2 * s12 + C2))
            / ((mu1 ** 2 + mu2 ** 2 + C1) * (s11 + s22 + C2))).mean().item()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_gan_noise_decay():
    """0.9^(step/5000) (run_nerf.py:1860-1862)."""
    np.testing.assert_allclose(float(losses.gan_noise_std_at(0, 0.1)), 0.1)
    np.testing.assert_allclose(float(losses.gan_noise_std_at(5000, 0.1)),
                               0.09, rtol=1e-6)


def test_vgg_feature_distance_l1_l2(rng_np):
    a = {"l1": jnp.asarray(rng_np.standard_normal((1, 4, 4, 8)).astype(np.float32))}
    b = {"l1": jnp.asarray(rng_np.standard_normal((1, 4, 4, 8)).astype(np.float32))}
    d1 = float(losses.vgg_feature_distance(a, b, ["l1"], [2.0], "l1"))
    np.testing.assert_allclose(
        d1, 2 * np.abs(np.asarray(a["l1"]) - np.asarray(b["l1"])).mean(),
        rtol=1e-6)
    d2 = float(losses.vgg_feature_distance(a, b, ["l1"], [0.5], "l2"))
    np.testing.assert_allclose(
        d2, 0.5 * ((np.asarray(a["l1"]) - np.asarray(b["l1"])) ** 2).mean(),
        rtol=1e-6)
    with pytest.raises(ValueError):
        losses.vgg_feature_distance(a, b, ["l1"], [1.0], "huber")


def test_sigma_loss_large_sigma_no_overflow():
    """sigma > 88 overflows exp(f32); the max-shifted evaluation must stay
    finite (the training path feeds post-ReLU sigma straight in)."""
    s = np.full((4, 12), 0.0, np.float32)
    s[:, -1] = 500.0
    got = np.asarray(losses.sigma_loss_from_sigma(jnp.asarray(s)))
    assert np.isfinite(got).all()
    # All mass at the last sample -> loss approaches its -1 infimum.
    np.testing.assert_allclose(got, -1.0, atol=1e-4)
