"""Pose-pipeline unit tests: view matrices, recentering, spherify, spirals,
and the COLMAP depth loader."""

import numpy as np
import pytest

from depth_lidar_nerf_tpu.data.poses import (
    average_pose,
    generate_render_path,
    recenter_poses,
    spherify_poses,
    spiral_path,
    view_matrix,
)


def _look_poses(n=6, radius=4.0, arc=0.6, full_circle=False):
    """Cameras looking at the origin (NeRF convention: -z forward).

    Default: a forward-facing arc (LLFF-like, non-degenerate averaging);
    ``full_circle`` for the spherify test.
    """
    thetas = (np.linspace(0, 2 * np.pi, n, endpoint=False) if full_circle
              else np.linspace(-arc, arc, n))
    poses = []
    for th in thetas:
        pos = np.array([radius * np.sin(th), 0.3, radius * np.cos(th)])
        z = pos / np.linalg.norm(pos)  # camera z points AWAY from target
        poses.append(view_matrix(z, np.array([0, 1, 0.0]), pos))
    hwf = np.tile(np.array([[24.0], [32.0], [30.0]]), (n, 1, 1))
    return np.concatenate([np.stack(poses), hwf], axis=2)


def test_view_matrix_orthonormal():
    m = view_matrix(np.array([0.3, 0.2, 0.9]), np.array([0, 1, 0.0]),
                    np.array([1, 2, 3.0]))
    R = m[:, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(m[:, 3], [1, 2, 3])


def test_recenter_moves_average_to_identity():
    poses = _look_poses()
    rec = recenter_poses(poses)
    avg = average_pose(rec)
    np.testing.assert_allclose(avg[:3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(avg[:3, 3], 0.0, atol=1e-6)


def test_spherify_normalizes_radius():
    poses = _look_poses(full_circle=True)
    bds = np.tile([2.0, 8.0], (len(poses), 1))
    reset, path, bds2 = spherify_poses(poses, bds)
    rad = np.linalg.norm(reset[:, :3, 3], axis=1)
    np.testing.assert_allclose(np.sqrt(np.mean(rad**2)), 1.0, rtol=1e-6)
    assert path.shape == (120, 3, 5)
    # bounds rescaled by the same factor
    assert bds2.shape == bds.shape and (bds2 > 0).all()


def test_spiral_path_count_and_validity():
    poses = _look_poses()
    c2w = average_pose(poses)
    up = poses[:, :3, 1].sum(0)
    sp = spiral_path(c2w, up / np.linalg.norm(up), rads=[0.5, 0.5, 0.2],
                     focal=3.0, N=40)
    assert sp.shape == (40, 3, 5)
    for p in sp[:5]:
        R = p[:3, :3]
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-9)


def test_generate_render_path():
    poses = _look_poses()[:, :3, :4]
    out = generate_render_path(poses, focal=30.0, N_views=12)
    assert out.shape == (12, 3, 4)
    # rotations stay orthonormal and every view shares the focal target
    for p in out:
        np.testing.assert_allclose(p[:3, :3] @ p[:3, :3].T, np.eye(3),
                                   atol=1e-6)


def test_load_colmap_depth(tmp_path, rng_np):
    """End-to-end: sparse model + poses_bounds -> per-image depth lists
    (load_llff.py:359-406 semantics: bounds filter, reprojection weights)."""
    import struct as st

    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(st.pack("<Q", 1))
        f.write(st.pack("<iiQQ", 1, 0, 40, 30))
        f.write(st.pack("<ddd", 35.0, 20.0, 15.0))
    with open(sparse / "images.bin", "wb") as f:
        f.write(st.pack("<Q", 1))
        f.write(st.pack("<i", 1))
        f.write(st.pack("<dddd", 1, 0, 0, 0))  # identity rotation
        f.write(st.pack("<ddd", 0, 0, 0))
        f.write(st.pack("<i", 1))
        f.write(b"a.png\x00")
        f.write(st.pack("<Q", 3))
        for pid in (1, 2, 3):
            f.write(st.pack("<dd", 8.0, 8.0))
            f.write(st.pack("<q", pid))
    with open(sparse / "points3D.bin", "wb") as f:
        f.write(st.pack("<Q", 3))
        # z=5 and z=9 inside bounds [2, 10]; z=100 outside
        for pid, z, err in ((1, 5.0, 0.5), (2, 9.0, 1.0), (3, 100.0, 0.5)):
            f.write(st.pack("<Q", pid))
            f.write(st.pack("<ddd", 0.0, 0.0, z))
            f.write(st.pack("<BBB", 1, 2, 3))
            f.write(st.pack("<d", err))
            f.write(st.pack("<Q", 1))
            f.write(np.array([[1, 0]], np.int32).tobytes())

    # poses_bounds for the bd rescale inside the loader
    pose_row = np.concatenate([np.eye(4)[:3, :4],
                               np.array([[30.0], [40.0], [35.0]])], axis=1)
    np.save(tmp_path / "poses_bounds.npy",
            np.concatenate([pose_row.reshape(1, -1), [[2.0, 10.0]]], axis=1))

    from depth_lidar_nerf_tpu.data.depth import load_colmap_depth

    out = load_colmap_depth(str(tmp_path), factor=2, bd_factor=0.75)
    assert len(out) == 1
    d = out[0]
    sc = 1.0 / (2.0 * 0.75)
    # the out-of-bounds point is dropped; depths are rescaled by sc
    np.testing.assert_allclose(sorted(d["depth"]), [5.0 * sc, 9.0 * sc],
                               rtol=1e-5)
    np.testing.assert_allclose(d["coord"], 8.0 / 2, rtol=1e-6)  # /factor
    assert (d["weight"] > 0).all() and (d["weight"] <= 2.0 + 1e-6).all()


def test_load_colmap_depth_name_order_not_id_order(tmp_path):
    """poses_bounds.npy rows are filename-sorted (colmap_to_poses_bounds);
    the depth lists must align by NAME even when COLMAP registered the
    images in a different order (IDs 1='b.png', 2='a.png')."""
    from depth_lidar_nerf_tpu.data.colmap_model import (
        Camera, Image, Point3D, write_model)
    from depth_lidar_nerf_tpu.data.depth import load_colmap_depth

    q = np.array([1.0, 0, 0, 0])
    cams = {1: Camera(1, 0, 40, 30, np.array([35.0, 20.0, 15.0]))}
    # Two cameras at different z so a point's depth differs per image:
    # image 'a.png' (ID 2!) sits at origin, 'b.png' (ID 1) at z=+1
    # (tvec = -R @ center, so tz=-1 puts the center at z=+1).
    mk = lambda i, name, tz, pid: Image(  # noqa: E731
        i, q, np.array([0.0, 0.0, tz]), 1, name,
        np.array([[8.0, 8.0]]), np.array([pid]))
    images = {1: mk(1, "b.png", -1.0, 7), 2: mk(2, "a.png", 0.0, 7)}
    pts = {7: Point3D(7, np.array([0.0, 0.0, 5.0]), np.zeros(3, np.uint8),
                      0.5, np.array([1, 2]), np.array([0, 0]))}
    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)
    write_model(cams, images, pts, str(sparse), ext=".bin")

    pose_row = np.concatenate(
        [np.eye(4)[:3, :4], np.array([[30.0], [40.0], [35.0]])], axis=1)
    rows = np.concatenate([pose_row.reshape(1, -1)] * 2, axis=0)
    np.save(tmp_path / "poses_bounds.npy",
            np.concatenate([rows, [[2.0, 10.0], [2.0, 10.0]]], axis=1))

    out = load_colmap_depth(str(tmp_path), factor=2, bd_factor=0.75)
    sc = 1.0 / (2.0 * 0.75)
    # out[0] must be 'a.png' (depth 5), out[1] 'b.png' (depth 5-1=4) —
    # ID order would swap them.
    np.testing.assert_allclose(out[0]["depth"], [5.0 * sc], rtol=1e-5)
    np.testing.assert_allclose(out[1]["depth"], [4.0 * sc], rtol=1e-5)
