"""Differential tests against the reference's own TORCH core math.

`test_reference_differential.py` pins the numpy pose/loader chain by running
the reference's own code; this file does the same for the torch side —
`run_nerf_helpers.py` (embedder, ray generation, NDC warp, inverse-CDF
sampling, compositing) and `loss.py` (sigma loss, inverse-depth smoothness,
SSIM) — imported from the reference checkout with only its unavailable heavy
deps (lpips, detectron2 segmentor) stubbed. A shared misreading of the
reference semantics in our jnp ports cannot survive these.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted")


@pytest.fixture(scope="module")
def ref_helpers():
    """The reference run_nerf_helpers.py with real torch, stubs elsewhere."""
    import importlib.util

    stubs = {}
    for name in ("lpips", "preprocess.KITTI360",
                 "preprocess.KITTI360.segmentor", "matplotlib",
                 "matplotlib.pyplot"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            if name == "lpips":
                m.lpips = types.ModuleType("lpips.lpips")
            if name.endswith("segmentor"):
                m.SemanticSegmentorHelper = object
            stubs[name] = m
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_helpers", os.path.join(REF, "run_nerf_helpers.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for name in stubs:
            sys.modules.pop(name, None)


@pytest.fixture(scope="module")
def ref_loss():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_loss", os.path.join(REF, "loss.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_embedder_matches_reference(ref_helpers, rng_np):
    from depth_lidar_nerf_tpu.ops.embedding import positional_encoding

    for multires in (4, 10):
        embed_fn, out_dim = ref_helpers.get_embedder(multires, 0)
        x = rng_np.normal(size=(33, 3)).astype(np.float32)
        want = embed_fn(torch.from_numpy(x)).numpy()
        got = np.asarray(positional_encoding(jnp.asarray(x), multires))
        assert got.shape == (33, out_dim)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ray_generation_matches_reference(ref_helpers, rng_np):
    from depth_lidar_nerf_tpu.ops.rays import camera_rays, rays_by_coord

    H, W, focal = 12, 16, 20.0
    q, _ = np.linalg.qr(rng_np.normal(size=(3, 3)))
    c2w = np.concatenate([q, rng_np.normal(size=(3, 1))], 1).astype(np.float32)

    ro_w, rd_w = ref_helpers.get_rays_np(H, W, focal, c2w)
    ro_g, rd_g = camera_rays(H, W, focal, jnp.asarray(c2w))
    np.testing.assert_allclose(np.asarray(ro_g), ro_w, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd_g), rd_w, rtol=1e-5, atol=1e-6)

    coords = np.stack([rng_np.uniform(0, W, 40),
                       rng_np.uniform(0, H, 40)], -1).astype(np.float32)
    # reference signature takes (coords_x, coords_y)
    ro_w, rd_w = ref_helpers.get_rays_by_coord_np(
        H, W, focal, c2w, coords)
    ro_g, rd_g = rays_by_coord(H, W, focal, jnp.asarray(c2w),
                               jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(ro_g), ro_w, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd_g), rd_w, rtol=1e-4, atol=1e-5)


def test_ndc_rays_matches_reference(ref_helpers, rng_np):
    from depth_lidar_nerf_tpu.ops.rays import ndc_rays

    H, W, focal = 24, 32, 40.0
    ro = rng_np.normal(size=(50, 3)).astype(np.float32)
    rd = rng_np.normal(size=(50, 3)).astype(np.float32)
    rd[:, 2] = -np.abs(rd[:, 2]) - 0.3  # forward-facing
    ro[:, 2] = -np.abs(ro[:, 2]) - 2.0

    o_w, d_w = ref_helpers.ndc_rays(H, W, focal, 1.0,
                                    torch.from_numpy(ro),
                                    torch.from_numpy(rd))
    o_g, d_g = ndc_rays(H, W, focal, 1.0, jnp.asarray(ro), jnp.asarray(rd))
    np.testing.assert_allclose(np.asarray(o_g), o_w.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_g), d_w.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_sample_pdf_det_matches_reference(ref_helpers, rng_np):
    """Deterministic inverse-CDF resampling, including adversarial weights
    (zero rows, single spikes) that exercise the tie/clamp branches the
    gather-free formulation must reproduce."""
    from depth_lidar_nerf_tpu.ops.sampling import sample_pdf

    bins = np.sort(rng_np.uniform(2.0, 6.0, (16, 31)), -1).astype(np.float32)
    weights = rng_np.uniform(0, 1, (16, 30)).astype(np.float32)
    weights[0] = 0.0  # all-zero row -> uniform pdf via the 1e-5 floor
    weights[1] = 0.0
    weights[1, 7] = 100.0  # single spike -> heavy ties in the cdf
    weights[2, :15] = 0.0  # leading zeros

    want = ref_helpers.sample_pdf(torch.from_numpy(bins),
                                  torch.from_numpy(weights), 24,
                                  det=True).numpy()
    got = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 24,
                                det=True))
    # torch and XLA cumsum can differ by ~5e-7 in the cdf; when a u value
    # lands inside that window of a cdf edge the two implementations pick
    # adjacent buckets — legitimate float divergence, not a semantics
    # difference. Require exact agreement everywhere EXCEPT such knife-edge
    # elements.
    w = weights + 1e-5
    cdf = np.cumsum(w / w.sum(-1, keepdims=True), -1)
    cdf = np.concatenate([np.zeros_like(cdf[:, :1]), cdf], -1)
    u = np.broadcast_to(np.linspace(0, 1, 24, dtype=np.float64),
                        (16, 24))
    edge_dist = np.abs(u[..., None] - cdf[:, None, :]).min(-1)
    safe = edge_dist > 1e-6
    assert safe.mean() > 0.9  # the test must mostly run on safe elements
    np.testing.assert_allclose(got[safe], want[safe], rtol=1e-4, atol=1e-5)


def test_raw2outputs_matches_reference(ref_helpers, rng_np):
    """noise=0 compositing (rgb/disp/acc/weights/depth) plus the semantic
    branch's UNWEIGHTED sum and the white-background composite."""
    from depth_lidar_nerf_tpu.ops.compositing import raw2outputs

    N, S, C = 18, 24, 5
    raw = rng_np.normal(size=(N, S, 4 + C)).astype(np.float32) * 2.0
    z = np.sort(rng_np.uniform(2, 6, (N, S)), -1).astype(np.float32)
    rd = rng_np.normal(size=(N, 3)).astype(np.float32)

    for white in (False, True):
        want = ref_helpers.raw2outputs(
            torch.from_numpy(raw), torch.from_numpy(z),
            torch.from_numpy(rd), raw_noise_std=0, white_bkgd=white,
            semantic_loss=True)
        got = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd),
                          raw_noise_std=0.0, white_bkgd=white,
                          num_semantic_classes=C)
        names = ("rgb", "disp", "acc", "weights", "depth", "semantic")
        ours = (got.rgb, got.disp, got.acc, got.weights, got.depth,
                got.semantic)
        for name, w, g in zip(names, want, ours):
            np.testing.assert_allclose(np.asarray(g), w.numpy(), rtol=2e-4,
                                       atol=2e-5, err_msg=name)


def test_sigma_loss_matches_reference(ref_loss, rng_np):
    """SigmaLoss.calculate_loss (perturb=0, noise=0) against our z sampling
    + stabilized per-ray formula, with a shared deterministic field."""
    from depth_lidar_nerf_tpu.ops.sampling import stratified_z_vals
    from depth_lidar_nerf_tpu.train import losses

    N, S = 12, 16
    ro = rng_np.normal(size=(N, 3)).astype(np.float32)
    rd = rng_np.normal(size=(N, 3)).astype(np.float32)
    near = np.full((N, 1), 0.5, np.float32)
    depths = rng_np.uniform(2.0, 5.0, (N,)).astype(np.float32)
    coef = rng_np.normal(size=(3,)).astype(np.float32)

    def field_np(pts):  # deterministic sigma from position
        return np.tensordot(np.sin(pts), coef, axes=([-1], [0]))

    def run_func(pts, viewdirs, network):
        sig = torch.from_numpy(field_np(pts.numpy()).astype(np.float32))
        raw = torch.zeros(pts.shape[:-1] + (4,))
        raw[..., 3] = sig
        return raw

    sl = ref_loss.SigmaLoss(N_samples=S, perturb=0.0, raw_noise_std=0.0)
    want = sl.calculate_loss(torch.from_numpy(ro), torch.from_numpy(rd),
                             None, torch.from_numpy(near), None,
                             torch.from_numpy(depths), run_func,
                             None).numpy()

    z = stratified_z_vals(jnp.asarray(near), jnp.asarray(depths)[:, None], S,
                          perturb=False)
    pts = ro[:, None, :] + rd[:, None, :] * np.asarray(z)[..., None]
    sigma = jnp.maximum(jnp.asarray(field_np(pts)), 0.0)
    got = np.asarray(losses.sigma_loss_from_sigma(sigma))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_inverse_depth_smoothness_matches_reference(ref_loss, rng_np):
    from depth_lidar_nerf_tpu.train import losses

    d = rng_np.uniform(0, 1, (2, 9, 13, 1)).astype(np.float32)
    img = rng_np.uniform(0, 1, (2, 9, 13, 3)).astype(np.float32)
    want = ref_loss.InverseDepthSmoothnessLoss()(
        torch.from_numpy(d.transpose(0, 3, 1, 2)),
        torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(losses.inverse_depth_smoothness_loss(
        jnp.asarray(d), jnp.asarray(img)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_ssim_matches_reference(ref_loss, rng_np):
    from depth_lidar_nerf_tpu.train import losses

    a = rng_np.uniform(0, 1, (1, 3, 32, 36)).astype(np.float32)
    b = np.clip(a + rng_np.normal(size=a.shape).astype(np.float32) * 0.05,
                0, 1)
    want = float(ref_loss.ssim(torch.from_numpy(a), torch.from_numpy(b),
                               window_size=11))
    got = float(losses.ssim(jnp.asarray(a.transpose(0, 2, 3, 1)),
                            jnp.asarray(b.transpose(0, 2, 3, 1)),
                            window_size=11))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def ref_disc():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_disc", os.path.join(REF, "discriminator.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("arch,nh,nw", [("esr", 16, 24), ("ls", 32, 32),
                                        ("basic", 12, 16)])
def test_discriminators_match_reference(ref_disc, rng_np, arch, nh, nw):
    """All three discriminator variants against the reference's OWN classes
    (discriminator.py:19-117), weights converted through
    convert_discriminator — pins conv padding/stride, LeakyReLU slope, and
    the NCHW->NHWC flatten permutation of the final linear."""
    import jax

    from depth_lidar_nerf_tpu.models.discriminator import (
        BasicDiscriminator, ESRDiscriminator, LSDiscriminator)
    from depth_lidar_nerf_tpu.train.torch_import import convert_discriminator

    cls = {"esr": ref_disc.ESRDiscriminator, "ls": ref_disc.LSDiscriminator,
           "basic": ref_disc.BasicDiscriminator}[arch]
    ours = {"esr": ESRDiscriminator, "ls": LSDiscriminator,
            "basic": BasicDiscriminator}[arch]()

    tm = cls(input_shape=(3, nh, nw))
    torch.manual_seed(7)
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn_like(p) * 0.1)
    tm.eval()

    x = rng_np.normal(size=(2, nh, nw, 3)).astype(np.float32)
    variables = ours.init(jax.random.key(0), jnp.asarray(x))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert_discriminator(variables, sd, patch_hw=(nh, nw),
                                      arch=arch)
    got = np.asarray(ours.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        # the reference's .view needs a contiguous NCHW tensor
        xin = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
        want = tm(xin).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.fixture(scope="module")
def ref_eval():
    """The reference eval_utils.py (numpy/scipy ssim; tf stubbed — only
    load_lpips touches it)."""
    import importlib.util

    stubs = {}
    for name in ("tensorflow", "tensorflow.compat", "tensorflow.compat.v1"):
        if name not in sys.modules:
            stubs[name] = types.ModuleType(name)
    stubs.get("tensorflow", sys.modules.get("tensorflow")).compat = \
        stubs.get("tensorflow.compat")
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_eval", os.path.join(REF, "eval_utils.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for name in stubs:
            sys.modules.pop(name, None)


def test_eval_ssim_matches_reference(ref_eval, rng_np):
    """The offline-eval SSIM (evaluation/metrics.ssim_np) against the
    reference's eval_utils.ssim (the fspecial numpy implementation the
    paper's Table 1 numbers were computed with)."""
    from depth_lidar_nerf_tpu.evaluation.metrics import ssim_np

    a = rng_np.uniform(0, 1, (24, 30, 3)).astype(np.float64)
    b = np.clip(a + rng_np.normal(size=a.shape) * 0.06, 0, 1)
    want = ref_eval.ssim(a[None] * 255.0, b[None] * 255.0, max_val=255)
    got = ssim_np(a, b, max_val=1.0)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_eval_ssim_small_image_filter_reduction(ref_eval, rng_np):
    """Images smaller than the 11-tap window: the reference shrinks the
    filter and rescales sigma (eval_utils.py:80-86); ours must too."""
    from depth_lidar_nerf_tpu.evaluation.metrics import ssim_np

    a = rng_np.uniform(0, 1, (7, 9, 3)).astype(np.float64)
    b = np.clip(a + rng_np.normal(size=a.shape) * 0.1, 0, 1)
    want = ref_eval.ssim(a[None] * 255.0, b[None] * 255.0, max_val=255)
    got = ssim_np(a, b, max_val=1.0)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_eval_ssim_filter_size_zero_matches_reference(ref_eval, rng_np):
    """filter_size=0 is the reference's no-blur identity path
    (eval_utils.py:86-99); ours must not crash on the empty window."""
    from depth_lidar_nerf_tpu.evaluation.metrics import ssim_np

    a = rng_np.uniform(0, 1, (10, 12, 3)).astype(np.float64)
    b = np.clip(a + rng_np.normal(size=a.shape) * 0.05, 0, 1)
    want = ref_eval.ssim(a[None] * 255.0, b[None] * 255.0, max_val=255,
                         filter_size=0)
    got = ssim_np(a, b, max_val=1.0, filter_size=0)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_dc_discriminator_matches_reference(ref_disc, rng_np):
    """The 4th discriminator variant (DCDiscriminator, discriminator.py:
    118-151 — dead code upstream, run_nerf.py:1255): bias-free 4x4 stride-2
    conv pyramid + VALID conv_out, weights converted through
    convert_discriminator(arch="dc")."""
    import jax

    from depth_lidar_nerf_tpu.models.discriminator import DCDiscriminator
    from depth_lidar_nerf_tpu.train.torch_import import convert_discriminator

    tm = ref_disc.DCDiscriminator(in_dim=3, n_feat=128, img_size=32)
    torch.manual_seed(11)
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn_like(p) * 0.1)
    tm.eval()

    ours = DCDiscriminator(in_dim=3, n_feat=128, img_size=32)
    # 5 channels: the reference slices x[:, :in_dim]; ours must match.
    x = rng_np.normal(size=(2, 32, 32, 5)).astype(np.float32)
    variables = ours.init(jax.random.key(0), jnp.asarray(x))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert_discriminator(variables, sd, arch="dc")
    got = np.asarray(ours.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        xin = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
        want = tm(xin).numpy()
    assert got.shape == want.shape == (2, 1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
