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
def llff_fixture_dir(tmp_path_factory):
    """On-disk LLFF scene + COLMAP sparse model both loaders can read:
    images/ + pre-built images_2/ (so the reference's _minify subprocess
    never runs), poses_bounds.npy, depth_gt.npy, sparse/0/*.bin."""
    from depth_lidar_nerf_tpu.data import colmap_model as cm
    from depth_lidar_nerf_tpu.data.llff import minify
    from depth_lidar_nerf_tpu.data.synthetic import make_scene

    d = tmp_path_factory.mktemp("llff_fixture")
    make_scene(str(d), n_images=3, H=32, W=48, focal=40.0, n_depth_points=150)
    minify(str(d), 2)

    # A small COLMAP sparse model consistent with "some" reconstruction —
    # load_colmap_depth only needs geometric consistency within the model.
    rng = np.random.default_rng(7)
    cams = {1: cm.Camera(1, 1, 48, 32, np.array([40.0, 40.0, 24.0, 16.0]))}
    pts, images = {}, {}
    # Points ahead of the near-identity cameras along +z (COLMAP depth is
    # measured along the camera z axis), inside the synthetic scene's bounds
    # so the reference's bds filter (load_llff.py:392) keeps most of them.
    n_pts = 120
    xyz = rng.normal(size=(n_pts, 3)) * 0.5 + np.array([0.0, 0.0, 3.0])
    for pid in range(1, n_pts + 1):
        pts[pid] = cm.Point3D(
            pid, xyz[pid - 1], rng.integers(0, 256, 3),
            float(rng.uniform(0.2, 2.0)),
            np.array([1], np.int32), np.array([pid - 1], np.int32))
    for iid in range(1, 4):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        q = np.array([1.0, 0.0, 0.0, 0.0]) * 0.9 + 0.1 * q  # near identity
        q /= np.linalg.norm(q)
        ids = np.arange(1, n_pts + 1, dtype=np.int64)
        ids[rng.uniform(size=n_pts) < 0.2] = -1  # untriangulated 2D points
        images[iid] = cm.Image(
            iid, q, rng.normal(size=3) * 0.3, 1, f"im_{iid:03d}.png",
            rng.uniform(0, 48, (n_pts, 2)), ids)
    os.makedirs(os.path.join(d, "sparse", "0"), exist_ok=True)
    cm.write_model(cams, images, pts, os.path.join(d, "sparse", "0"),
                   ext=".bin")
    return str(d)


@pytest.fixture(scope="module")
def ref_llff_io(llff_fixture_dir):
    """Reference load_llff.py with REAL colmapUtils readers (from the
    reference checkout) and an imageio shim, so its full data loaders —
    load_llff_data / load_lidar_depth / load_colmap_depth — run for real."""
    import importlib.util

    stubs = {}

    def _mod(name):
        m = types.ModuleType(name)
        stubs[name] = m
        return m

    for name in ("torch", "matplotlib", "matplotlib.pyplot",
                 "preprocess.KITTI360", "preprocess.KITTI360.segmentor"):
        if name not in sys.modules:
            m = _mod(name)
            if name.endswith("segmentor"):
                m.SemanticSegmentorHelper = object

    # Real reference colmapUtils (pure numpy/struct).
    pkg = _mod("colmapUtils")
    pkg.__path__ = [os.path.join(REF, "colmapUtils")]
    for sub in ("read_write_model", "read_write_dense"):
        spec = importlib.util.spec_from_file_location(
            f"colmapUtils.{sub}", os.path.join(REF, "colmapUtils", f"{sub}.py"))
        m = importlib.util.module_from_spec(spec)
        stubs[f"colmapUtils.{sub}"] = m
        sys.modules[f"colmapUtils.{sub}"] = m
        spec.loader.exec_module(m)

    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_load_llff_io", os.path.join(REF, "load_llff.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        # imageio shim INSIDE the ref module only: modern imageio rejects
        # the legacy ignoregamma kwarg the reference passes
        # (load_llff.py:121).
        import imageio.v2 as iio2
        shim = types.ModuleType("ref_imageio_shim")
        shim.imread = lambda f, **kw: iio2.imread(f)
        mod.imageio = shim
        yield mod
    finally:
        for name in stubs:
            sys.modules.pop(name, None)


def test_load_llff_data_matches_reference(ref_llff_io, llff_fixture_dir,
                                          tmp_path, monkeypatch):
    """End-to-end load_llff_data (axis fix + bd rescale + recenter + spiral
    + holdout pick, load_llff.py:254-345) against the reference's own code
    on the same on-disk scene."""
    from depth_lidar_nerf_tpu.data.llff import load_llff_data

    # The reference dumps a debug poses_our.npy into cwd (load_llff.py:274).
    monkeypatch.chdir(tmp_path)
    r_imgs, r_poses, r_bds, r_render, r_itest = ref_llff_io.load_llff_data(
        llff_fixture_dir, factor=2, recenter=True, bd_factor=0.75)
    o_imgs, o_poses, o_bds, o_render, o_itest = load_llff_data(
        llff_fixture_dir, factor=2, recenter=True, bd_factor=0.75)

    np.testing.assert_allclose(o_imgs, r_imgs, rtol=0, atol=1e-7)
    np.testing.assert_allclose(o_poses, r_poses, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(o_bds, r_bds, rtol=1e-6, atol=0)
    np.testing.assert_allclose(o_render, np.asarray(r_render), rtol=1e-5,
                               atol=1e-6)
    assert o_itest == int(r_itest)


def test_load_lidar_depth_matches_reference(ref_llff_io, llff_fixture_dir):
    """load_lidar_depth (sc rescale + NDC 1 - 1/d, load_llff.py:461-552)
    against the reference's own code."""
    from depth_lidar_nerf_tpu.data.depth import load_lidar_depth

    hwf = [32, 48, 40.0]
    ref = ref_llff_io.load_lidar_depth(llff_fixture_dir, hwf, factor=None,
                                       bd_factor=0.75)
    ours = load_lidar_depth(llff_fixture_dir, factor=None, bd_factor=0.75)
    assert len(ours) == len(ref)
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(o["depth"], r["depth"], rtol=1e-6,
                                   atol=1e-7)
        np.testing.assert_allclose(o["coord"], r["coord"], rtol=1e-6, atol=0)
        np.testing.assert_allclose(o["weight"], r["weight"], rtol=1e-6,
                                   atol=0)


def test_load_colmap_depth_matches_reference(ref_llff_io, llff_fixture_dir):
    """load_colmap_depth (reprojection depth + bounds filter + error
    weighting, load_llff.py:359-406) against the reference's own code,
    which also cross-checks our binary COLMAP writers against the
    reference's own readers."""
    from depth_lidar_nerf_tpu.data.depth import load_colmap_depth

    ref = ref_llff_io.load_colmap_depth(llff_fixture_dir, factor=2,
                                        bd_factor=0.75)
    ours = load_colmap_depth(llff_fixture_dir, factor=2, bd_factor=0.75)
    # The reference drops images whose filtered point list is empty
    # (load_llff.py:399-403); ours keeps empty entries to preserve indexing.
    ours_nonempty = [o for o in ours if len(o["depth"])]
    assert len(ours_nonempty) == len(ref)
    for o, r in zip(ours_nonempty, ref):
        np.testing.assert_allclose(o["depth"], r["depth"], rtol=1e-6,
                                   atol=1e-7)
        np.testing.assert_allclose(o["coord"], r["coord"], rtol=1e-6, atol=0)
        np.testing.assert_allclose(o["weight"], r["weight"], rtol=1e-6,
                                   atol=0)


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


def test_fill_in_multiscale_empty_columns_no_extrapolate(ref_depth_utils,
                                                         rng_np):
    """extrapolate=False with a wide fully-empty column band: the
    reference's argmax-based top mask keeps empty columns ALL-True, so the
    6x dilation loop fills the band's edges from its neighbors — a cummax
    mask would leave the whole band unfilled (different supervision
    coverage in depth_gt.npy)."""
    pytest.importorskip("cv2")
    from preprocess.kitti360.depth_completion import fill_in_multiscale

    d = _sparse_depth(rng_np)
    d[:, 60:96] = 0.0  # wider than the 6x 5x5-dilation reach (~12 px)
    ours = fill_in_multiscale(d.copy(), extrapolate=False,
                              blur_type="gaussian")
    ref = ref_depth_utils.fill_in_multiscale(d.copy(), extrapolate=False,
                                             blur_type="gaussian")
    assert (ref[:, 60:72] > 0).any()  # the band edge really gets filled
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_generate_renderpath_matches_reference(rng_np):
    """--render_mypath generator vs the reference's own
    utils/generate_renderpath.py (numpy-only, imported directly)."""
    import importlib.util

    from depth_lidar_nerf_tpu.data.poses import generate_render_path

    spec = importlib.util.spec_from_file_location(
        "ref_grp", os.path.join(REF, "utils", "generate_renderpath.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    poses = _random_poses(rng_np, 6, with_hwf=False)
    want = np.stack(mod.generate_renderpath(poses.copy(), focal=42.0,
                                            N_views=20, N_rots=2, zrate=0.5))
    got = generate_render_path(poses, focal=42.0, N_views=20, N_rots=2,
                               zrate=0.5)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_colmap_to_poses_bounds_matches_reference(tmp_path, rng_np):
    """The imgs2poses output writer (colmap_to_poses_bounds) vs the
    reference's own pose_utils.load_colmap_data + save_poses on a shared
    synthetic sparse model — pins the axis permutation, the name-sort
    `perm`, the visibility-filtered depth percentiles (.5/99.5), and the
    hwf column."""
    import importlib.util

    from depth_lidar_nerf_tpu.data.colmap_model import (
        Camera, Image, Point3D, write_model)
    from depth_lidar_nerf_tpu.data.colmap_pipeline import (
        colmap_to_poses_bounds)

    # synthetic sparse model: 3 images (IDs 1..3, shuffled names so the
    # name-sort perm is non-trivial), 40 points with varied visibility
    q = np.array([1.0, 0, 0, 0])
    names = ["c.png", "a.png", "b.png"]
    imgs = {}
    pts_vis = {i: [] for i in (1, 2, 3)}
    pts = {}
    for pid in range(1, 41):
        xyz = rng_np.normal(size=3) * 2 + np.array([0, 0, 6.0])
        vis = [i for i in (1, 2, 3) if rng_np.uniform() < 0.8] or [1]
        pts[pid] = Point3D(pid, xyz, np.zeros(3, np.uint8),
                           float(rng_np.uniform(0.2, 2.0)),
                           np.array(vis), np.zeros(len(vis), int))
        for i in vis:
            pts_vis[i].append(pid)
    for i in (1, 2, 3):
        rot, _ = np.linalg.qr(rng_np.normal(size=(3, 3)))
        if np.linalg.det(rot) < 0:
            rot[:, 0] *= -1
        # qvec for the reference reader; our writer stores qvec directly
        from depth_lidar_nerf_tpu.data.colmap_model import rotmat2qvec

        imgs[i] = Image(i, rotmat2qvec(rot), rng_np.normal(size=3), 1,
                        names[i - 1], np.zeros((0, 2)), np.zeros(0, int))
    cams = {1: Camera(1, 0, 64, 48, np.array([55.0, 32.0, 24.0]))}
    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)
    write_model(cams, imgs, pts, str(sparse), ext=".bin")

    # reference pose_utils with its unused heavy deps stubbed
    stubs = {}
    for name in ("imageio", "skimage", "skimage.transform", "llff",
                 "llff.poses", "llff.poses.colmap_wrapper"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            if name.endswith("colmap_wrapper"):
                m.run_colmap = lambda *a, **k: None
            stubs[name] = m
    crm_spec = importlib.util.spec_from_file_location(
        "llff.poses.colmap_read_model",
        os.path.join(REF, "llff", "poses", "colmap_read_model.py"))
    crm = importlib.util.module_from_spec(crm_spec)
    stubs["llff.poses.colmap_read_model"] = crm
    sys.modules.update(stubs)
    try:
        crm_spec.loader.exec_module(crm)
        spec = importlib.util.spec_from_file_location(
            "ref_pose_utils", os.path.join(REF, "llff", "poses",
                                           "pose_utils.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        poses, pts3d, perm = mod.load_colmap_data(str(tmp_path))
        mod.save_poses(str(tmp_path), poses, pts3d, perm)
        want = np.load(tmp_path / "poses_bounds.npy")
    finally:
        for name in stubs:
            sys.modules.pop(name, None)

    got = colmap_to_poses_bounds(str(tmp_path))
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-9)
