"""KITTI-360 preprocessing tests on a synthetic mini-dataset fixture."""

import os

import numpy as np
import pytest

from preprocess.kitti360.calibration import (
    load_calibration_camera_to_pose,
    load_calibration_rigid,
    load_perspective_intrinsics,
)
from preprocess.kitti360.dataset import (
    Kitti360Dataset,
    SKY_DEPTH,
    lat_to_scale,
    latlon_to_mercator,
    mercator_to_latlon,
)
from preprocess.kitti360.depth_completion import fill_in_fast, fill_in_multiscale
from preprocess.kitti360 import segmentor as seg


W_IMG, H_IMG, FOCAL = 64, 48, 60.0


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    """Minimal on-disk KITTI-360 tree: calibration + poses + one LiDAR sweep."""
    root = tmp_path_factory.mktemp("kitti360")
    seq = "2013_05_28_drive_0000_sync"
    (root / "calibration").mkdir()
    (root / "data_poses" / seq).mkdir(parents=True)
    velo = root / "data_3d_raw" / seq / "velodyne_points" / "data"
    velo.mkdir(parents=True)

    # Identity-ish calibration: cameras at GPS/IMU origin, velodyne 1m up.
    def mat_line(name, m):
        return name + ": " + " ".join(f"{x:.9f}" for x in np.asarray(m).ravel())

    eye34 = np.eye(4)[:3]
    with open(root / "calibration" / "calib_cam_to_pose.txt", "w") as f:
        for cam in ("image_00", "image_01", "image_02", "image_03"):
            f.write(mat_line(cam, eye34) + "\n")
    velo_to_cam0 = np.eye(4)
    velo_to_cam0[2, 3] = -1.0  # cam0 -> velo: shift z
    with open(root / "calibration" / "calib_cam_to_velo.txt", "w") as f:
        f.write(" ".join(f"{x:.9f}" for x in velo_to_cam0[:3].ravel()))

    K = np.array([[FOCAL, 0, W_IMG / 2, 0], [0, FOCAL, H_IMG / 2, 0],
                  [0, 0, 1, 0]])
    with open(root / "calibration" / "perspective.txt", "w") as f:
        for cam in ("00", "01"):
            f.write(mat_line(f"P_rect_{cam}", K) + "\n")
            f.write(mat_line(f"R_rect_{cam}", np.eye(3)) + "\n")
            f.write(f"S_rect_{cam}: {W_IMG} {H_IMG}\n")

    # Poses: identity cam0_to_world at frame 7, a translated frame 8 (two
    # lines so the reference's bare np.loadtxt stays 2-D).
    pose44 = np.eye(4)
    pose44_b = np.eye(4)
    pose44_b[:3, 3] = [0.5, -0.25, 2.0]
    with open(root / "data_poses" / seq / "cam0_to_world.txt", "w") as f:
        f.write("7 " + " ".join(f"{x:.9f}" for x in pose44.ravel()) + "\n")
        f.write("8 " + " ".join(f"{x:.9f}" for x in pose44_b.ravel()) + "\n")
    with open(root / "data_poses" / seq / "poses.txt", "w") as f:
        f.write("7 " + " ".join(f"{x:.9f}" for x in pose44[:3].ravel()) + "\n")
        f.write("8 " + " ".join(f"{x:.9f}" for x in pose44_b[:3].ravel())
                + "\n")

    # LiDAR sweep: a frontal wall of points at z=+5 in camera frame. Camera
    # looks along +z (KITTI rectified convention); velodyne frame is camera
    # shifted by 1m in z.
    rng = np.random.default_rng(0)
    n = 4000
    xyz_cam = np.stack([
        rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
        np.full(n, 5.0) + rng.uniform(-0.1, 0.1, n)
    ], axis=-1)
    # velo frame = cam frame + 1 in z (TrVeloToCam = inv(cam->velo))
    xyz_velo = xyz_cam.copy()
    xyz_velo[:, 2] += -1.0
    pts = np.concatenate([xyz_velo, rng.uniform(0, 1, (n, 1))], -1)
    pts.astype(np.float32).tofile(velo / "0000000007.bin")
    return str(root)


def test_calibration_parsers(kitti_root):
    cam_to_pose = load_calibration_camera_to_pose(
        os.path.join(kitti_root, "calibration", "calib_cam_to_pose.txt"))
    assert set(cam_to_pose) == {"image_00", "image_01", "image_02", "image_03"}
    np.testing.assert_allclose(cam_to_pose["image_00"], np.eye(4))

    rigid = load_calibration_rigid(
        os.path.join(kitti_root, "calibration", "calib_cam_to_velo.txt"))
    assert rigid.shape == (4, 4) and rigid[2, 3] == -1.0

    intr = load_perspective_intrinsics(
        os.path.join(kitti_root, "calibration", "perspective.txt"))
    assert intr["P_rect_00"][0, 0] == FOCAL
    assert intr["R_rect_01"].shape == (3, 3)


def test_lidar_projection(kitti_root):
    ds = Kitti360Dataset(0, 0, kitti_root)
    u, v, depth = ds.project_lidar(7)
    assert len(u) > 1000
    assert (depth > 4.5).all() and (depth < 5.5).all()
    assert (u >= 0).all() and (u < W_IMG).all()
    assert (v >= 0).all() and (v < H_IMG).all()


def test_depth_and_coords_raw(kitti_root):
    ds = Kitti360Dataset(0, 0, kitti_root)
    coords, depth, lo, hi = ds.depth_and_coords(7, complete=False)
    assert coords.shape[1] == 2
    assert 4.5 < lo < hi < 5.6


def test_create_poses_bounds_artifacts(kitti_root, tmp_path):
    ds = Kitti360Dataset(0, 0, kitti_root)
    sky = [np.array([[0, 0], [1, 0], [2, 0]])]  # few top pixels as "sky"
    rows, depth_list = ds.create_poses_bounds_and_gt_depths(
        [7], sky, out_dir=str(tmp_path))
    assert rows.shape == (1, 17)
    # hwf column
    arr = rows[0, :15].reshape(3, 5)
    assert arr[0, 4] == H_IMG and arr[1, 4] == W_IMG and arr[2, 4] == FOCAL
    # depth completion filled the frame (far more points than the sweep)
    d = depth_list[0]
    assert len(d["depth"]) > 2000
    assert (d["depth"] == SKY_DEPTH).sum() >= 3
    assert os.path.exists(tmp_path / "poses_bounds.npy")
    assert os.path.exists(tmp_path / "depth_gt.npy")


def test_depth_completion_fills_holes():
    rng = np.random.default_rng(1)
    grid = np.zeros((60, 80), np.float32)
    ys = rng.integers(20, 60, 300)
    xs = rng.integers(0, 80, 300)
    grid[ys, xs] = rng.uniform(5, 12, 300)
    dense = fill_in_multiscale(grid, max_depth=15.0, extrapolate=True)
    filled = (dense > 0.1).mean()
    assert filled > 0.95
    assert dense.max() <= 15.5 and dense[dense > 0.1].min() >= 0

    fast = fill_in_fast(grid.copy(), max_depth=15.0, extrapolate=True)
    assert (fast > 0.1).mean() > 0.9


def test_segmentor_helpers():
    logits = np.random.default_rng(0).normal(size=(19, 8, 10)).astype(np.float32)
    logits = seg.zero_out_absent_classes(np.array([14, 15]), logits)
    assert (logits[14] == 0).all()
    probs = seg.softmax_probabilities(logits)
    np.testing.assert_allclose(probs.sum(0), 1.0, rtol=1e-5)
    preds = seg.class_predictions(probs)
    assert preds.shape == (8, 10)
    img = seg.segmented_image(preds)
    assert img.shape == (8, 10, 3)
    preds = np.zeros((8, 10), int)
    preds[:2] = seg.SKY_CLASS
    sc = seg.sky_coords(preds)
    assert (sc[:, 1] < 2).all() and len(sc) == 20
    down = seg.downsample_predictions(preds, 4, 5)
    assert down.shape == (4, 5)


def test_mercator_roundtrip():
    lat, lon = 48.98, 8.43
    scale = lat_to_scale(lat)
    mx, my = latlon_to_mercator(lat, lon, scale)
    lat2, lon2 = mercator_to_latlon(mx, my, scale)
    assert abs(lat - lat2) < 1e-9 and abs(lon - lon2) < 1e-9


def test_convert_oxts_to_pose_matches_reference(rng_np):
    """Differential: the reference's own convertOxtsToPose loop
    (Kitti360Dataset.py:386-456) rebuilt on its preprocess_utils.py (pure
    numpy, imported directly) vs convert_oxts_to_pose on random records."""
    import importlib.util

    path = "/root/reference/preprocess/KITTI360/preprocess_utils.py"
    if not os.path.exists(path):
        pytest.skip("reference checkout not mounted")
    spec = importlib.util.spec_from_file_location("ref_preproc_utils", path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from preprocess.kitti360.dataset import KARLSRUHE_ORIGIN, convert_oxts_to_pose

    records = np.stack([
        np.concatenate([
            [KARLSRUHE_ORIGIN[0] + rng_np.uniform(-0.01, 0.01),
             KARLSRUHE_ORIGIN[1] + rng_np.uniform(-0.01, 0.01),
             rng_np.uniform(100, 130)],
            rng_np.uniform(-np.pi, np.pi, 3),
            rng_np.uniform(-1, 1, 24),  # velocity/accel tail (ignored)
        ]) for _ in range(5)
    ])

    # The reference's loop, verbatim semantics, on ITS helper functions.
    scale = ref.latToScale(KARLSRUHE_ORIGIN[0])
    ox, oy = ref.latlonToMercator(KARLSRUHE_ORIGIN[0], KARLSRUHE_ORIGIN[1],
                                  scale)
    origin = np.array([ox, oy, 0])
    want = []
    for r in records:
        tx, ty = ref.latlonToMercator(r[0], r[1], scale)
        t = np.array([tx, ty, r[2]]) - origin
        rx, ry, rz = r[3], r[4], r[5]
        Rx = np.array([[1, 0, 0], [0, np.cos(rx), -np.sin(rx)],
                       [0, np.sin(rx), np.cos(rx)]])
        Ry = np.array([[np.cos(ry), 0, np.sin(ry)], [0, 1, 0],
                       [-np.sin(ry), 0, np.cos(ry)]])
        Rz = np.array([[np.cos(rz), -np.sin(rz), 0],
                       [np.sin(rz), np.cos(rz), 0], [0, 0, 1]])
        want.append(np.vstack([np.hstack([Rz @ Ry @ Rx, t.reshape(3, 1)]),
                               [0, 0, 0, 1]]))
    want = np.stack(ref.postprocessPoses(want))

    got = convert_oxts_to_pose(records)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-9)

    # Single-record convenience shape.
    one = convert_oxts_to_pose(records[0])
    np.testing.assert_allclose(one[0], want[0], rtol=1e-12, atol=1e-9)


def test_cam2world_from_oxts_fallback(kitti_root):
    """cam2world falls back to the raw-OXTS chain when cam0_to_world.txt is
    absent; with identity calibration the camera pose equals the IMU pose."""
    from preprocess.kitti360.dataset import (
        KARLSRUHE_ORIGIN, Kitti360Dataset, convert_oxts_to_pose)

    ds = Kitti360Dataset(seq=0, cam_id=0, kitti360_path=kitti_root)
    os.makedirs(ds.oxts_dir, exist_ok=True)
    rec = np.concatenate([
        [KARLSRUHE_ORIGIN[0] + 1e-4, KARLSRUHE_ORIGIN[1] - 2e-4, 115.0],
        [0.01, -0.02, 0.8], np.zeros(24)])
    np.savetxt(os.path.join(ds.oxts_dir, "0000000007.txt"), rec[None])

    want_imu = convert_oxts_to_pose(rec)[0]
    np.testing.assert_allclose(ds.oxts_pose(7), want_imu, rtol=1e-9)
    # Identity cam_to_pose + identity R_rect => cam2world == IMU pose.
    np.testing.assert_allclose(ds.cam2world_from_oxts(7), want_imu,
                               rtol=1e-9, atol=1e-12)

    ds.cam0_to_world_file = os.path.join(kitti_root, "missing.txt")
    np.testing.assert_allclose(ds.cam2world(7), want_imu, rtol=1e-9,
                               atol=1e-12)


def test_perspective_camera_matches_reference(kitti_root, rng_np,
                                              monkeypatch):
    """Our PerspectiveCamera vs the reference's own cameras.py on the same
    on-disk calibration/pose fixture: the cam2world chain (pose @ camToPose
    @ R_rect^-1), the cam2image(New) rounding/|depth| projection, and the
    inverse world2cam transform."""
    import importlib.util
    import sys

    seq = "2013_05_28_drive_0000_sync"
    ref_dir = "/root/reference/preprocess/KITTI360"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference checkout not mounted")
    monkeypatch.setattr(np, "int", int, raising=False)  # legacy np.int use
    sys.path.insert(0, ref_dir)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_cameras", os.path.join(ref_dir, "cameras.py"))
        ref_cams = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_cams)
        ref = ref_cams.CameraPerspective(kitti_root, seq=seq, cam_id=0)
    finally:
        sys.path.remove(ref_dir)

    from preprocess.kitti360.camera import PerspectiveCamera

    ours = PerspectiveCamera(kitti_root, seq, cam_id=0)

    # cam2world chain at the fixture's frame
    np.testing.assert_allclose(ours.cam2world[7], ref.cam2world[7],
                               rtol=1e-9, atol=1e-12)

    # projection: random camera-frame points incl. behind-camera z<0
    pts = rng_np.normal(size=(3, 50)) * 3.0
    pts[2, :40] = np.abs(pts[2, :40]) + 0.5
    pts[2, 40:] = -np.abs(pts[2, 40:]) - 0.5
    u_w, v_w, d_w, _ = ref.cam2imageNew(pts.copy())
    u_g, v_g, d_g = ours.project(pts.copy())
    np.testing.assert_array_equal(u_g, u_w)
    np.testing.assert_array_equal(v_g, v_w)
    np.testing.assert_allclose(d_g, d_w, rtol=1e-12)

    # inverse world2cam
    world = rng_np.normal(size=(30, 3)) * 5.0
    c2w = ref.cam2world[7]
    want = ref.world2cam(world, c2w[:3, :3], c2w[:3, 3], inverse=True)
    got = ours.world2cam(world, 7)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)


def test_velo_to_rect_chain_matches_reference(kitti_root, monkeypatch):
    """Tr(velodyne -> rectified cam) vs the reference's own
    Kitti360Dataset.get_velo_to_rec_cam on the shared calibration fixture
    (cam0->velo inversion, cam_k->cam_0 composition, R_rect)."""
    import importlib.util
    import sys
    import types

    ref_dir = "/root/reference/preprocess/KITTI360"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference checkout not mounted")
    monkeypatch.setattr(np, "int", int, raising=False)

    def load_as(name, fname):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(ref_dir, fname))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    stubs = ["open3d"]
    saved = {}
    for s in stubs:
        saved[s] = sys.modules.get(s)
        sys.modules[s] = types.ModuleType(s)
    sys.path.insert(0, ref_dir)
    loaded = []
    try:
        for name, fname in (
                ("preprocess.KITTI360.loadCalibration", "loadCalibration.py"),
                ("preprocess.KITTI360.cameras", "cameras.py"),
                ("preprocess.KITTI360.preprocess_utils",
                 "preprocess_utils.py")):
            load_as(name, fname)
            loaded.append(name)
        ref_mod = load_as("ref_k360_dataset", "Kitti360Dataset.py")
        loaded.append("ref_k360_dataset")
        ds_ref = ref_mod.Kitti360Dataset(0, 0, kitti_root)
        want = ds_ref.get_velo_to_rec_cam()
    finally:
        sys.path.remove(ref_dir)
        for name in loaded:
            sys.modules.pop(name, None)
        for s in stubs:
            if saved[s] is None:
                sys.modules.pop(s, None)
            else:
                sys.modules[s] = saved[s]

    ds = Kitti360Dataset(0, 0, kitti_root)
    np.testing.assert_allclose(ds.velo_to_rect(), want, rtol=1e-12,
                               atol=1e-14)


def test_fisheye_camera_matches_reference(kitti_root, rng_np, monkeypatch):
    """FisheyeCamera (MEI model) vs the reference's own CameraFisheye on a
    shared OpenCV-YAML intrinsics file: unit-sphere projection, xi mirror
    offset, radial distortion, gamma/principal point, and signed depth."""
    import importlib.util
    import sys

    ref_dir = "/root/reference/preprocess/KITTI360"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference checkout not mounted")
    yaml_path = os.path.join(kitti_root, "calibration", "image_02.yaml")
    if not os.path.exists(yaml_path):
        with open(yaml_path, "w") as f:
            f.write("%YAML:1.0\n"
                    "image_width:1400\n"
                    "image_height:1400\n"
                    "mirror_parameters:\n   xi:2.2\n"
                    "distortion_parameters:\n   k1:0.02\n   k2:-0.006\n"
                    "projection_parameters:\n"
                    "   gamma1:1336.0\n   gamma2:1335.0\n"
                    "   u0:716.9\n   v0:705.8\n")

    monkeypatch.setattr(np, "int", int, raising=False)
    # legacy yaml.load(stream) without a Loader (cameras.py:19)
    import yaml as _yaml

    orig_load = _yaml.load
    monkeypatch.setattr(
        _yaml, "load",
        lambda s, *a, **k: orig_load(s, Loader=_yaml.SafeLoader))
    sys.path.insert(0, ref_dir)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_cameras_fe", os.path.join(ref_dir, "cameras.py"))
        ref_cams = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_cams)
        ref = ref_cams.CameraFisheye(
            kitti_root, seq="2013_05_28_drive_0000_sync", cam_id=2)
    finally:
        sys.path.remove(ref_dir)

    from preprocess.kitti360.camera import FisheyeCamera

    ours = FisheyeCamera(kitti_root, "2013_05_28_drive_0000_sync", cam_id=2)
    assert ours.width == ref.width and ours.height == ref.height

    pts = rng_np.normal(size=(3, 60)) * 4.0
    pts[2, :45] = np.abs(pts[2, :45]) + 0.5
    pts[2, 45:] = -np.abs(pts[2, 45:]) - 0.5
    u_w, v_w, d_w = ref.cam2image(pts.copy())
    u_g, v_g, d_g = ours.project(pts.copy())
    np.testing.assert_allclose(np.asarray(u_g, np.float64), u_w, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(v_g, np.float64), v_w, rtol=1e-9)
    np.testing.assert_allclose(d_g, d_w, rtol=1e-9)

    # fisheye cam2world chain skips the rectification term
    np.testing.assert_allclose(ours.cam2world[7], ref.cam2world[7],
                               rtol=1e-9, atol=1e-12)


def test_depth_and_coords_complete_matches_reference(kitti_root, monkeypatch):
    """The v2 adapter's full depth-completion flow (rasterize ->
    fill_in_multiscale(extrapolate) -> sky stamp -> nonzero re-flatten ->
    post-completion .1/99.9 percentiles) vs the reference's own
    Kitti360DatasetNew.get_depth_and_coords on the shared fixture."""
    import importlib.util
    import sys
    import types

    ref_root = "/root/reference"
    ref_dir = os.path.join(ref_root, "preprocess", "KITTI360")
    if not os.path.isdir(ref_dir):
        pytest.skip("reference checkout not mounted")
    monkeypatch.setattr(np, "int", int, raising=False)

    saved_open3d = sys.modules.get("open3d")
    sys.modules["open3d"] = types.ModuleType("open3d")
    # the reference's flat imports + its top-level utils package
    sys.path.insert(0, ref_dir)
    sys.path.insert(0, ref_root)
    saved_utils = sys.modules.pop("utils", None)
    saved_dmu = sys.modules.pop("utils.depth_map_utils", None)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_k360_new", os.path.join(ref_dir, "Kitti360Dataset_new.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        ds_ref = mod.Kitti360DatasetNew(0, 0, kitti_root)
        sky = np.array([[0, 0], [1, 0], [5, 1]])
        want_coords, want_depth, want_lo, want_hi = \
            ds_ref.get_depth_and_coords(7, sky)
    finally:
        sys.path.remove(ref_dir)
        sys.path.remove(ref_root)
        sys.modules.pop("open3d", None)
        if saved_open3d is not None:
            sys.modules["open3d"] = saved_open3d
        sys.modules.pop("utils", None)
        sys.modules.pop("utils.depth_map_utils", None)
        if saved_utils is not None:
            sys.modules["utils"] = saved_utils
        if saved_dmu is not None:
            sys.modules["utils.depth_map_utils"] = saved_dmu

    ds = Kitti360Dataset(0, 0, kitti_root)
    coords, depths, lo, hi = ds.depth_and_coords(
        7, np.array([[0, 0], [1, 0], [5, 1]]), complete=True)

    np.testing.assert_array_equal(coords, np.asarray(want_coords))
    np.testing.assert_allclose(depths, want_depth, rtol=1e-6)
    np.testing.assert_allclose([lo, hi], [want_lo, want_hi], rtol=1e-6)
