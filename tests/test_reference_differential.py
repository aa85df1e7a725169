"""Differential tests against the reference's OWN numpy code.

The pose conventions are the "easy to get silently wrong" item (SURVEY.md
§7): every oracle elsewhere in this suite is a re-derivation by the same
author, which cannot catch a shared misreading. Here we import the
reference's actual modules (``/root/reference/load_llff.py:136-251`` and
``/root/reference/utils/depth_map_utils.py``) — their pose/fill functions
are pure numpy/cv2; the torch/matplotlib/colmapUtils imports at module top
are satisfied with empty stubs — and assert our implementations reproduce
them to float tolerance on random inputs.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted")


@pytest.fixture(scope="module")
def ref_llff():
    """Import the reference load_llff.py with its heavy deps stubbed out."""
    import importlib.util

    stubs = {}
    for name in ("torch", "matplotlib", "matplotlib.pyplot",
                 "colmapUtils", "colmapUtils.read_write_model",
                 "colmapUtils.read_write_dense",
                 "preprocess.KITTI360", "preprocess.KITTI360.segmentor"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name.endswith("segmentor"):
                mod.SemanticSegmentorHelper = object
            stubs[name] = mod
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_load_llff", os.path.join(REF, "load_llff.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for name in stubs:
            sys.modules.pop(name, None)


def _random_poses(rng, n, with_hwf=True):
    """[n, 3, 5] valid c2w poses: proper rotations + positions + hwf col."""
    out = []
    hwf = np.array([[120.0], [160.0], [140.0]])
    for _ in range(n):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        t = rng.normal(size=(3, 1)) * 2.0
        p = np.concatenate([q, t], axis=1)
        if with_hwf:
            p = np.concatenate([p, hwf], axis=1)
        out.append(p)
    return np.stack(out)


def test_viewmatrix_matches_reference(ref_llff, rng_np):
    from depth_lidar_nerf_tpu.data.poses import view_matrix

    for _ in range(10):
        z = rng_np.normal(size=3)
        up = rng_np.normal(size=3)
        pos = rng_np.normal(size=3)
        np.testing.assert_allclose(view_matrix(z, up, pos),
                                   ref_llff.viewmatrix(z, up, pos),
                                   rtol=1e-12, atol=1e-12)


def test_ptstocam_matches_reference(ref_llff, rng_np):
    from depth_lidar_nerf_tpu.data.poses import world_to_camera

    c2w = _random_poses(rng_np, 1)[0, :, :4]
    pts = rng_np.normal(size=(50, 3))
    np.testing.assert_allclose(world_to_camera(pts, c2w),
                               ref_llff.ptstocam(pts, c2w),
                               rtol=1e-12, atol=1e-12)


def test_poses_avg_matches_reference(ref_llff, rng_np):
    from depth_lidar_nerf_tpu.data.poses import average_pose

    poses = _random_poses(rng_np, 7)
    np.testing.assert_allclose(average_pose(poses), ref_llff.poses_avg(poses),
                               rtol=1e-12, atol=1e-12)


def test_recenter_poses_matches_reference(ref_llff, rng_np):
    from depth_lidar_nerf_tpu.data.poses import recenter_poses

    poses = _random_poses(rng_np, 9)
    np.testing.assert_allclose(recenter_poses(poses),
                               ref_llff.recenter_poses(poses.copy()),
                               rtol=1e-9, atol=1e-9)


def test_spiral_path_matches_reference(ref_llff, rng_np):
    from depth_lidar_nerf_tpu.data.poses import average_pose, spiral_path

    poses = _random_poses(rng_np, 6)
    c2w = average_pose(poses)
    up = poses[:, :3, 1].sum(0)
    rads = [0.4, 0.3, 0.2]
    ours = spiral_path(c2w, up, rads, focal=1.6, zrate=0.5, rots=2, N=40)
    # zdelta is accepted and unused by the reference (load_llff.py:164-173).
    ref = np.stack(ref_llff.render_path_spiral(
        c2w, up, rads, focal=1.6, zdelta=0.1, zrate=0.5, rots=2, N=40))
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)


def test_spherify_poses_matches_reference(ref_llff, rng_np):
    from depth_lidar_nerf_tpu.data.poses import spherify_poses

    # Cameras roughly looking at the origin from a shell (well-conditioned
    # for the min-line-dist solve), with jitter.
    poses = _random_poses(rng_np, 12)
    for i in range(poses.shape[0]):
        pos = poses[i, :3, 3]
        fwd = -pos / np.linalg.norm(pos)
        up_h = np.array([0.0, 1.0, 0.0])
        x = np.cross(up_h, fwd)
        x /= np.linalg.norm(x)
        y = np.cross(fwd, x)
        poses[i, :3, :3] = np.stack([x, y, fwd], axis=1)
    bds = np.abs(rng_np.normal(size=(poses.shape[0], 2))) + 1.0

    ours_reset, ours_path, ours_bds = spherify_poses(poses, bds.copy())
    ref_reset, ref_path, ref_bds = ref_llff.spherify_poses(poses, bds.copy())
    np.testing.assert_allclose(ours_reset, ref_reset, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(ours_path, ref_path, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(ours_bds, ref_bds, rtol=1e-9, atol=1e-9)


@pytest.fixture(scope="module")
def ref_depth_utils():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_depth_map_utils", os.path.join(REF, "utils/depth_map_utils.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _sparse_depth(rng, H=64, W=96, density=0.12):
    d = np.zeros((H, W), np.float32)
    n = int(H * W * density)
    ys = rng.integers(0, H, n)
    xs = rng.integers(0, W, n)
    d[ys, xs] = rng.uniform(2.0, 70.0, n).astype(np.float32)
    return d


def test_fill_in_fast_matches_reference(ref_depth_utils, rng_np):
    pytest.importorskip("cv2")
    from preprocess.kitti360.depth_completion import fill_in_fast

    d = _sparse_depth(rng_np)
    ours = fill_in_fast(d.copy(), extrapolate=True, blur_type="gaussian")
    ref = ref_depth_utils.fill_in_fast(d.copy(), extrapolate=True,
                                       blur_type="gaussian")
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_fill_in_multiscale_matches_reference(ref_depth_utils, rng_np):
    pytest.importorskip("cv2")
    from preprocess.kitti360.depth_completion import fill_in_multiscale

    d = _sparse_depth(rng_np)
    ours = fill_in_multiscale(d.copy(), extrapolate=True,
                              blur_type="bilateral")
    ref = ref_depth_utils.fill_in_multiscale(d.copy(), extrapolate=True,
                                             blur_type="bilateral")
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
