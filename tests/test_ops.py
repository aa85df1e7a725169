"""Numpy-oracle unit tests for the core rendering ops.

Each oracle re-derives the reference semantics (file:line cited per test)
independently in numpy/torch, so these tests pin the math contract without
sharing any code with the JAX implementations.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from depth_lidar_nerf_tpu.ops import (
    camera_rays,
    embedding_dim,
    ndc_rays,
    positional_encoding,
    rays_by_coord,
    raw2outputs,
    sample_pdf,
    searchsorted_right,
    stratified_z_vals,
)


# ---------------------------------------------------------------- embedding

def _embed_oracle(x, num_freqs):
    """run_nerf_helpers.py:25-55 layout: [x, sin(f0 x), cos(f0 x), ...]."""
    out = [x]
    for f in 2.0 ** np.linspace(0.0, num_freqs - 1, num_freqs):
        out.append(np.sin(x * f))
        out.append(np.cos(x * f))
    return np.concatenate(out, axis=-1)


@pytest.mark.parametrize("num_freqs,dims", [(10, 3), (4, 3), (1, 2)])
def test_positional_encoding_matches_oracle(rng_np, num_freqs, dims):
    x = rng_np.standard_normal((17, dims)).astype(np.float32)
    got = np.asarray(positional_encoding(jnp.asarray(x), num_freqs))
    want = _embed_oracle(x, num_freqs)
    assert got.shape[-1] == embedding_dim(dims, num_freqs)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_positional_encoding_identity():
    x = jnp.ones((4, 3))
    np.testing.assert_array_equal(positional_encoding(x, 0), x)


# ---------------------------------------------------------------- ray gen

def _rays_oracle(H, W, focal, c2w):
    """get_rays_np (run_nerf_helpers.py:285-300)."""
    i, j = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32),
                       indexing="xy")
    dirs = np.stack([(i - W * 0.5) / focal, -(j - H * 0.5) / focal, -np.ones_like(i)], -1)
    rays_d = np.sum(dirs[..., None, :] * c2w[:3, :3], -1)
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def _random_pose(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])
    t = rng.standard_normal((3, 1))
    return np.concatenate([R, t], axis=1).astype(np.float32)


def test_camera_rays_matches_oracle(rng_np):
    H, W, focal = 12, 9, 20.0
    c2w = _random_pose(rng_np)
    ro, rd = camera_rays(H, W, focal, jnp.asarray(c2w))
    ro_np, rd_np = _rays_oracle(H, W, focal, c2w)
    np.testing.assert_allclose(np.asarray(ro), ro_np, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rd), rd_np, rtol=1e-5, atol=1e-5)


def test_rays_by_coord_matches_full_grid(rng_np):
    """Rays through pixel (x, y) must equal the full-grid ray at [y, x].

    Oracle relationship: get_rays_by_coord_np (run_nerf_helpers.py:303-318)
    with integer coords reproduces get_rays_np entries.
    """
    H, W, focal = 8, 6, 11.0
    c2w = _random_pose(rng_np)
    coords = np.stack(
        [rng_np.integers(0, W, 20), rng_np.integers(0, H, 20)], axis=-1
    ).astype(np.float32)
    ro, rd = rays_by_coord(H, W, focal, jnp.asarray(c2w), jnp.asarray(coords))
    ro_full, rd_full = _rays_oracle(H, W, focal, c2w)
    want_d = rd_full[coords[:, 1].astype(int), coords[:, 0].astype(int)]
    np.testing.assert_allclose(np.asarray(rd), want_d, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ro), np.broadcast_to(c2w[:3, -1], (20, 3)),
                               rtol=1e-6)


def test_ndc_rays_matches_oracle(rng_np):
    """ndc_rays (run_nerf_helpers.py:320-337)."""
    H, W, focal = 40, 30, 35.0
    ro = rng_np.standard_normal((64, 3)).astype(np.float32)
    rd = rng_np.standard_normal((64, 3)).astype(np.float32)
    rd[:, 2] = -np.abs(rd[:, 2]) - 0.1  # forward-facing
    ro[:, 2] = -np.abs(ro[:, 2]) - 2.0

    near = 1.0
    t = -(near + ro[..., 2]) / rd[..., 2]
    ro_s = ro + t[..., None] * rd
    o0 = -1.0 / (W / (2.0 * focal)) * ro_s[..., 0] / ro_s[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * ro_s[..., 1] / ro_s[..., 2]
    o2 = 1.0 + 2.0 * near / ro_s[..., 2]
    d0 = -1.0 / (W / (2.0 * focal)) * (rd[..., 0] / rd[..., 2] - ro_s[..., 0] / ro_s[..., 2])
    d1 = -1.0 / (H / (2.0 * focal)) * (rd[..., 1] / rd[..., 2] - ro_s[..., 1] / ro_s[..., 2])
    d2 = -2.0 * near / ro_s[..., 2]

    got_o, got_d = ndc_rays(H, W, focal, near, jnp.asarray(ro), jnp.asarray(rd))
    np.testing.assert_allclose(np.asarray(got_o), np.stack([o0, o1, o2], -1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_d), np.stack([d0, d1, d2], -1),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------- sampling

def test_searchsorted_right_vs_numpy(rng_np):
    """Contract of torchsearchsorted side='right'
    (searchsorted_cpu_wrapper.cpp:20-28) == np.searchsorted side='right'."""
    for _ in range(20):
        a = np.sort(rng_np.standard_normal((7, 33)).astype(np.float32), axis=-1)
        v = rng_np.standard_normal((7, 11)).astype(np.float32)
        # include exact hits
        v[:, 0] = a[:, 5]
        got = np.asarray(searchsorted_right(jnp.asarray(a), jnp.asarray(v)))
        want = np.stack([np.searchsorted(a[r], v[r], side="right") for r in range(7)])
        np.testing.assert_array_equal(got, want)


def test_searchsorted_right_vs_torch(rng_np):
    torch = pytest.importorskip("torch")
    a = np.sort(rng_np.standard_normal((5, 65)).astype(np.float32), axis=-1)
    v = rng_np.uniform(0, 1, (5, 64)).astype(np.float32)
    got = np.asarray(searchsorted_right(jnp.asarray(a), jnp.asarray(v)))
    want = torch.searchsorted(torch.from_numpy(a), torch.from_numpy(v), right=True)
    np.testing.assert_array_equal(got, want.numpy())


def _sample_pdf_oracle(bins, weights, N_samples, u):
    """run_nerf_helpers.py:497-540 with supplied uniforms."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
    inds = np.stack([np.searchsorted(cdf[r], u[r], side="right")
                     for r in range(cdf.shape[0])])
    below = np.maximum(0, inds - 1)
    above = np.minimum(cdf.shape[-1] - 1, inds)
    cdf_g0 = np.take_along_axis(cdf, below, -1)
    cdf_g1 = np.take_along_axis(cdf, above, -1)
    bins_g0 = np.take_along_axis(bins, below, -1)
    bins_g1 = np.take_along_axis(bins, above, -1)
    denom = cdf_g1 - cdf_g0
    denom = np.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


def test_sample_pdf_det_matches_oracle(rng_np):
    N, S = 9, 64
    bins = np.sort(rng_np.uniform(0, 1, (N, S - 1)).astype(np.float32), -1)
    weights = rng_np.uniform(0, 1, (N, S - 2)).astype(np.float32)
    got = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 64, det=True))
    u = np.broadcast_to(np.linspace(0, 1, 64, dtype=np.float32), (N, 64))
    want = _sample_pdf_oracle(bins, weights, 64, u)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sample_pdf_random_within_support(rng_np):
    N, S = 6, 32
    bins = np.sort(rng_np.uniform(2.0, 6.0, (N, S - 1)).astype(np.float32), -1)
    weights = rng_np.uniform(0, 1, (N, S - 2)).astype(np.float32)
    got = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 128,
                                det=False, rng=jax.random.key(0)))
    assert got.shape == (N, 128)
    assert (got >= bins[:, :1] - 1e-5).all() and (got <= bins[:, -1:] + 1e-5).all()


def test_sample_pdf_concentrates_mass(rng_np):
    # A spike in the weights must attract most fine samples.
    N, S = 4, 64
    bins = np.broadcast_to(np.linspace(0, 1, S - 1, dtype=np.float32), (N, S - 1)).copy()
    weights = np.full((N, S - 2), 1e-4, np.float32)
    weights[:, 30] = 100.0
    got = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 64,
                                det=False, rng=jax.random.key(1)))
    frac_near_spike = (np.abs(got - bins[0, 30]) < 0.05).mean()
    assert frac_near_spike > 0.8


def test_stratified_z_vals(rng_np):
    near = jnp.full((5, 1), 2.0)
    far = jnp.full((5, 1), 6.0)
    z = np.asarray(stratified_z_vals(near, far, 11, perturb=False))
    np.testing.assert_allclose(z[0], np.linspace(2, 6, 11), rtol=1e-6)

    z_d = np.asarray(stratified_z_vals(near, far, 11, lindisp=True, perturb=False))
    np.testing.assert_allclose(z_d[0], 1.0 / np.linspace(1 / 2.0, 1 / 6.0, 11), rtol=1e-6)

    z_p = np.asarray(stratified_z_vals(near, far, 11, perturb=True,
                                       rng=jax.random.key(0)))
    # Jittered samples stay inside [near, far] and strictly ordered bins.
    assert (z_p >= 2.0 - 1e-6).all() and (z_p <= 6.0 + 1e-6).all()
    assert (np.diff(z_p, axis=-1) > -1e-6).all()


# ---------------------------------------------------------------- compositing

def _raw2outputs_oracle(raw, z_vals, rays_d, white_bkgd=False, num_sem=0):
    """run_nerf_helpers.py:542-595 (no noise)."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = np.concatenate([dists, np.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * np.linalg.norm(rays_d[..., None, :], axis=-1)
    rgb = 1.0 / (1.0 + np.exp(-raw[..., :3]))
    alpha = 1.0 - np.exp(-np.maximum(raw[..., 3], 0) * dists)
    ones = np.ones_like(alpha[..., :1])
    trans = np.cumprod(np.concatenate([ones, 1.0 - alpha + 1e-10], -1), -1)[..., :-1]
    weights = alpha * trans
    rgb_map = (weights[..., None] * rgb).sum(-2)
    depth_map = (weights * z_vals).sum(-1)
    acc_map = weights.sum(-1)
    disp_map = 1.0 / np.maximum(1e-10, depth_map / acc_map)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    sem = raw[..., 4:4 + num_sem].sum(-2) if num_sem else None
    return rgb_map, disp_map, acc_map, weights, depth_map, sem


@pytest.mark.parametrize("white_bkgd,num_sem", [(False, 0), (True, 0), (False, 5)])
def test_raw2outputs_matches_oracle(rng_np, white_bkgd, num_sem):
    N, S = 13, 32
    raw = rng_np.standard_normal((N, S, 4 + num_sem)).astype(np.float32)
    z_vals = np.sort(rng_np.uniform(0.5, 4.0, (N, S)).astype(np.float32), -1)
    rays_d = rng_np.standard_normal((N, 3)).astype(np.float32)

    out = raw2outputs(jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(rays_d),
                      white_bkgd=white_bkgd, num_semantic_classes=num_sem)
    rgb, disp, acc, weights, depth, sem = _raw2outputs_oracle(
        raw, z_vals, rays_d, white_bkgd, num_sem)
    np.testing.assert_allclose(np.asarray(out.rgb), rgb, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.depth), depth, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.acc), acc, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.weights), weights, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.disp), disp, rtol=2e-4, atol=2e-4)
    if num_sem:
        np.testing.assert_allclose(np.asarray(out.semantic), sem, rtol=2e-5, atol=2e-4)


def test_raw2outputs_weights_sum_below_one(rng_np):
    raw = rng_np.standard_normal((7, 16, 4)).astype(np.float32)
    z = np.sort(rng_np.uniform(0, 1, (7, 16)).astype(np.float32), -1)
    d = rng_np.standard_normal((7, 3)).astype(np.float32)
    out = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d))
    assert (np.asarray(out.acc) <= 1.0 + 1e-5).all()


def test_sample_pdf_pallas_matches_reference(rng_np):
    """The fused Pallas kernel must agree with the jnp reference (same rng)."""
    from depth_lidar_nerf_tpu.ops.sampling_pallas import sample_pdf_pallas

    interpret = jax.default_backend() not in ("tpu", "axon")
    N, S = 70, 32  # non-multiple of tile to exercise padding
    bins = np.sort(rng_np.uniform(1, 5, (N, S - 1)).astype(np.float32), -1)
    weights = rng_np.uniform(0, 1, (N, S - 2)).astype(np.float32)
    key = jax.random.key(3)
    got = np.asarray(sample_pdf_pallas(jnp.asarray(bins), jnp.asarray(weights),
                                       S, det=False, rng=key,
                                       interpret=interpret))
    want = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), S,
                                 det=False, rng=key))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    got_det = np.asarray(sample_pdf_pallas(jnp.asarray(bins),
                                           jnp.asarray(weights), S, det=True,
                                           interpret=interpret))
    want_det = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), S,
                                     det=True))
    np.testing.assert_allclose(got_det, want_det, rtol=1e-5, atol=1e-5)


def test_raw2outputs_t_matches_standard(rng_np):
    from depth_lidar_nerf_tpu.ops.compositing import raw2outputs_t

    N, S = 11, 24
    raw = rng_np.standard_normal((N, S, 4)).astype(np.float32)
    z = np.sort(rng_np.uniform(0.5, 4.0, (N, S)).astype(np.float32), -1)
    d = rng_np.standard_normal((N, 3)).astype(np.float32)
    a = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d))
    b = raw2outputs_t(jnp.asarray(raw.transpose(2, 0, 1)), jnp.asarray(z),
                      jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(a.rgb), np.asarray(b.rgb), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a.weights), np.asarray(b.weights), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a.disp), np.asarray(b.disp), rtol=1e-5)
