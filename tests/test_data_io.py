"""Data I/O tests: COLMAP dense arrays, fused ply, DTU, keras import,
colmap poses_bounds conversion."""

import os
import struct

import numpy as np
import pytest


def test_colmap_dense_array_roundtrip(tmp_path, rng_np):
    from depth_lidar_nerf_tpu.data.colmap_dense import read_array, write_array

    depth = rng_np.uniform(0, 10, (12, 17)).astype(np.float32)
    p = str(tmp_path / "depth.bin")
    write_array(depth, p)
    got = read_array(p)
    np.testing.assert_allclose(got, depth)


def test_fused_ply_roundtrip(tmp_path, rng_np):
    from depth_lidar_nerf_tpu.data.colmap_dense import read_fused

    n = 5
    xyz = rng_np.standard_normal((n, 3)).astype(np.float32)
    nrm = rng_np.standard_normal((n, 3)).astype(np.float32)
    rgb = rng_np.integers(0, 255, (n, 3)).astype(np.uint8)
    ply = tmp_path / "fused.ply"
    with open(ply, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {n}\n".encode())
        for prop in ("x", "y", "z", "nx", "ny", "nz"):
            f.write(f"property float {prop}\n".encode())
        for prop in ("red", "green", "blue"):
            f.write(f"property uchar {prop}\n".encode())
        f.write(b"end_header\n")
        for i in range(n):
            f.write(xyz[i].tobytes() + nrm[i].tobytes() + rgb[i].tobytes())
    vis = tmp_path / "fused.ply.vis"
    with open(vis, "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            f.write(struct.pack("<I", 2))
            f.write(np.array([i, i + 1], np.uint32).tobytes())

    pts = read_fused(str(ply), str(vis))
    assert len(pts) == n
    np.testing.assert_allclose(pts[0].position, xyz[0])
    assert pts[3].num_visible_images == 2
    np.testing.assert_array_equal(pts[3].visible_image_idxs, [3, 4])


def test_dtu_loader(tmp_path, rng_np):
    from depth_lidar_nerf_tpu.data.dtu import load_dtu_data

    import imageio.v2 as imageio

    H, W, f = 16, 20, 25.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    (tmp_path / "image").mkdir()
    cams = {}
    for i in range(3):
        img = (rng_np.uniform(0, 1, (H, W, 3)) * 255).astype(np.uint8)
        imageio.imwrite(tmp_path / "image" / f"{i:03d}.png", img)
        Rt = np.eye(4)
        Rt[:3, 3] = [0, 0, 2 + i]
        world_mat = np.eye(4)
        world_mat[:3] = K @ Rt[:3]
        cams[f"world_mat_{i}"] = world_mat
        cams[f"scale_mat_{i}"] = np.eye(4)
    np.savez(tmp_path / "cameras.npz", **cams)

    images, poses, hwf = load_dtu_data(str(tmp_path))
    assert images.shape == (3, H, W, 3)
    assert poses.shape == (3, 4, 4)
    assert abs(hwf[2] - f) < 1e-3
    # camera centers must match -R^T t = [0,0,-(2+i)]
    np.testing.assert_allclose(poses[1][:3, 3], [0, 0, -3], atol=1e-5)


def test_keras_import(rng_np):
    import jax
    import jax.numpy as jnp

    from depth_lidar_nerf_tpu.models import NeRFMLP
    from depth_lidar_nerf_tpu.models.keras_import import load_weights_from_keras

    depth, width = 2, 16
    model = NeRFMLP(depth=depth, width=width, in_channels=9, in_channels_views=6)
    params = model.init(jax.random.key(0), jnp.zeros((1, 9)), jnp.zeros((1, 6)))

    def shapes(name):
        k = params["params"][name]["kernel"].shape
        return rng_np.standard_normal(k).astype(np.float32), \
            rng_np.standard_normal(k[1]).astype(np.float32)

    ws = []
    for i in range(depth):
        ws.extend(shapes(f"trunk_{i}"))
    ws.extend(shapes("feature"))
    ws.extend(shapes("views_0"))
    ws.extend(shapes("rgb"))
    ws.extend(shapes("sigma"))

    new = load_weights_from_keras(params, ws, depth)
    np.testing.assert_allclose(new["params"]["trunk_0"]["kernel"], ws[0])
    np.testing.assert_allclose(new["params"]["sigma"]["bias"],
                               ws[-1].reshape(-1))
    out = model.apply(new, jnp.ones((2, 9)), jnp.ones((2, 6)))
    assert np.isfinite(np.asarray(out)).all()


def test_colmap_poses_bounds_conversion(tmp_path, rng_np):
    """Synthetic sparse model -> poses_bounds.npy via the pipeline converter."""
    import struct as st

    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)

    # cameras.bin: one SIMPLE_PINHOLE camera
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(st.pack("<Q", 1))
        f.write(st.pack("<iiQQ", 1, 0, 40, 30))
        f.write(st.pack("<ddd", 35.0, 20.0, 15.0))

    # images.bin: two identity-pose images, each seeing 2 points
    with open(sparse / "images.bin", "wb") as f:
        f.write(st.pack("<Q", 2))
        for iid, name in ((1, b"b.png"), (2, b"a.png")):
            f.write(st.pack("<i", iid))
            f.write(st.pack("<dddd", 1, 0, 0, 0))
            f.write(st.pack("<ddd", 0, 0, float(iid)))
            f.write(st.pack("<i", 1))
            f.write(name + b"\x00")
            f.write(st.pack("<Q", 2))
            for pid in (1, 2):
                f.write(st.pack("<dd", 1.0, 2.0))
                f.write(st.pack("<q", pid))

    # points3D.bin: two points in front of both cameras
    with open(sparse / "points3D.bin", "wb") as f:
        f.write(st.pack("<Q", 2))
        for pid, z in ((1, 5.0), (2, 9.0)):
            f.write(st.pack("<Q", pid))
            f.write(st.pack("<ddd", 0.0, 0.0, z))
            f.write(st.pack("<BBB", 10, 20, 30))
            f.write(st.pack("<d", 0.5))
            f.write(st.pack("<Q", 2))
            f.write(np.array([[1, 0], [2, 0]], np.int32).tobytes())

    from depth_lidar_nerf_tpu.data.colmap_pipeline import colmap_to_poses_bounds

    arr = colmap_to_poses_bounds(str(tmp_path))
    assert arr.shape == (2, 17)
    # hwf column present
    pose0 = arr[0, :15].reshape(3, 5)
    assert pose0[0, 4] == 30 and pose0[1, 4] == 40 and pose0[2, 4] == 35.0
    # bounds positive and ordered
    assert (arr[:, 15] > 0).all() and (arr[:, 16] > arr[:, 15]).all()
    assert os.path.exists(tmp_path / "poses_bounds.npy")


def test_ray_dataset_epochs(rng_np):
    from depth_lidar_nerf_tpu.data.ray_dataset import RayDataset, epoch_batches

    rays = rng_np.standard_normal((100, 3, 3)).astype(np.float32)
    sem = rng_np.integers(0, 5, 100)
    ds = RayDataset(rays, sem)
    assert len(ds) == 100
    seen = []
    for batch, labels in epoch_batches(ds, 32, np.random.default_rng(0)):
        assert batch.shape[1:] == (3, 3)
        assert len(batch) == len(labels)
        seen.append(len(batch))
    assert sum(seen) == 100  # full epoch coverage, no replacement


def _random_model(rng):
    from depth_lidar_nerf_tpu.data import colmap_model as cm

    cams = {1: cm.Camera(1, 1, 640, 480,
                         np.array([520.0, 521.5, 320.0, 240.25])),
            3: cm.Camera(3, 0, 100, 80, np.array([90.0, 50.0, 40.0]))}
    images = {}
    for iid in (2, 5):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        npts = int(rng.integers(0, 6))
        images[iid] = cm.Image(
            iid, q, rng.normal(size=3), 1, f"im_{iid:03d}.png",
            rng.uniform(0, 600, (npts, 2)),
            rng.integers(-1, 50, npts).astype(np.int64))
    points = {}
    for pid in (7, 11, 13):
        tlen = int(rng.integers(1, 4))
        points[pid] = cm.Point3D(
            pid, rng.normal(size=3), rng.integers(0, 256, 3),
            float(rng.uniform(0, 2)),
            rng.integers(1, 6, tlen).astype(np.int32),
            rng.integers(0, 9, tlen).astype(np.int32))
    return cams, images, points


def _assert_models_equal(a, b):
    cams_a, ims_a, pts_a = a
    cams_b, ims_b, pts_b = b
    assert set(cams_a) == set(cams_b)
    for cid in cams_a:
        x, y = cams_a[cid], cams_b[cid]
        assert (x.model, x.width, x.height) == (y.model, y.width, y.height)
        np.testing.assert_array_equal(x.params, y.params)
    assert set(ims_a) == set(ims_b)
    for iid in ims_a:
        x, y = ims_a[iid], ims_b[iid]
        np.testing.assert_array_equal(x.qvec, y.qvec)
        np.testing.assert_array_equal(x.tvec, y.tvec)
        assert (x.camera_id, x.name) == (y.camera_id, y.name)
        np.testing.assert_array_equal(x.xys, y.xys)
        np.testing.assert_array_equal(x.point3D_ids, y.point3D_ids)
    assert set(pts_a) == set(pts_b)
    for pid in pts_a:
        x, y = pts_a[pid], pts_b[pid]
        np.testing.assert_array_equal(x.xyz, y.xyz)
        np.testing.assert_array_equal(x.rgb, y.rgb)
        assert x.error == y.error
        np.testing.assert_array_equal(x.image_ids, y.image_ids)
        np.testing.assert_array_equal(x.point2D_idxs, y.point2D_idxs)


@pytest.mark.parametrize("ext", [".bin", ".txt"])
def test_colmap_model_roundtrip(tmp_path, rng_np, ext):
    """write_model -> read_model is lossless in both encodings (the role of
    the reference's read_write_model.py writers, colmapUtils:202-478)."""
    from depth_lidar_nerf_tpu.data import colmap_model as cm

    model = _random_model(rng_np)
    d = str(tmp_path / "model")
    cm.write_model(*model, d, ext=ext)
    _assert_models_equal(model, cm.read_model(d, ext=ext))


def test_colmap_images_text_zero_point_image(tmp_path, rng_np):
    """A zero-point image (empty points line) must not desync the text
    reader's header/points pairing (reference read_write_model.py:194-222
    consumes the points line raw)."""
    from depth_lidar_nerf_tpu.data import colmap_model as cm

    cams, images, points = _random_model(rng_np)
    q = np.array([1.0, 0.0, 0.0, 0.0])
    # Insert a zero-point image BETWEEN populated ones so a pairing shift
    # would corrupt every subsequent image.
    empty = cm.Image(3, q, np.zeros(3), 1, "empty.png",
                     np.zeros((0, 2)), np.zeros(0, np.int64))
    first, second = (images[i] for i in sorted(images))
    images = {first.id: first, 3: empty, second.id: second}
    d = str(tmp_path / "model")
    cm.write_model(cams, images, points, d, ext=".txt")
    _assert_models_equal((cams, images, points), cm.read_model(d, ".txt"))


def test_colmap_cross_encoding(tmp_path, rng_np):
    """bin-written and txt-written models read back identically."""
    from depth_lidar_nerf_tpu.data import colmap_model as cm

    model = _random_model(rng_np)
    db, dt = str(tmp_path / "b"), str(tmp_path / "t")
    cm.write_model(*model, db, ext=".bin")
    cm.write_model(*model, dt, ext=".txt")
    _assert_models_equal(cm.read_model(db, ".bin"), cm.read_model(dt, ".txt"))


def test_rotmat_qvec_roundtrip(rng_np):
    from depth_lidar_nerf_tpu.data.colmap_model import qvec2rotmat, rotmat2qvec

    for _ in range(10):
        q = rng_np.normal(size=4)
        q /= np.linalg.norm(q)
        q *= np.sign(q[0] + (q[0] == 0))
        np.testing.assert_allclose(rotmat2qvec(qvec2rotmat(q)), q, atol=1e-10)


def test_imread_rgb_float_grayscale_and_16bit(tmp_path, rng_np):
    """The shared reader fixes the reference's imread[..., :3]/255 pattern:
    2-D grayscale must expand to 3 channels (not have its WIDTH sliced to
    3), and 16-bit PNGs must scale by 65535 (not 255 -> [0, 257] values).
    8-bit RGB stays bit-identical to the reference's /255."""
    import imageio.v2 as imageio

    from depth_lidar_nerf_tpu.utils.images import imread_rgb_float

    gray = rng_np.integers(0, 256, (12, 20), np.uint8)
    imageio.imwrite(str(tmp_path / "gray.png"), gray)
    g = imread_rgb_float(str(tmp_path / "gray.png"))
    assert g.shape == (12, 20, 3)
    np.testing.assert_allclose(g[..., 0], gray / 255.0)
    np.testing.assert_array_equal(g[..., 0], g[..., 2])

    deep = rng_np.integers(0, 65536, (6, 7), np.uint16)
    imageio.imwrite(str(tmp_path / "deep.png"), deep)
    d = imread_rgb_float(str(tmp_path / "deep.png"))
    assert d.max() <= 1.0
    np.testing.assert_allclose(d[..., 0], deep / 65535.0)

    rgb = rng_np.integers(0, 256, (5, 4, 3), np.uint8)
    imageio.imwrite(str(tmp_path / "rgb.png"), rgb)
    np.testing.assert_array_equal(imread_rgb_float(str(tmp_path / "rgb.png")),
                                  rgb / 255.0)


def test_depth_on_image_runs_on_numpy2(rng_np):
    """depth_on_image used ndarray.ptp(), removed in NumPy 2.0 — it must
    scatter jet-colored depth points without crashing."""
    from depth_lidar_nerf_tpu.utils.visualization import depth_on_image

    img = rng_np.uniform(size=(16, 24, 3))
    pts = {"coord": np.array([[3, 4], [10, 12], [23, 15]]),
           "depth": np.array([2.0, 5.0, 9.0])}
    out = depth_on_image(pts, img)
    assert out.shape == (16, 24, 3) and out.dtype == np.uint8
    assert not np.array_equal(out[4, 3], (img[4, 3] * 255).astype(np.uint8))


def test_imread_rgb_float_la_png(tmp_path, rng_np):
    """Grayscale+alpha (LA) PNGs must come back [H, W, 3], not [H, W, 2]."""
    import imageio.v2 as imageio

    from depth_lidar_nerf_tpu.utils.images import imread_rgb_float

    la = rng_np.integers(0, 256, (8, 9, 2), np.uint8)
    imageio.imwrite(str(tmp_path / "la.png"), la)
    got = imread_rgb_float(str(tmp_path / "la.png"))
    assert got.shape == (8, 9, 3)
    np.testing.assert_allclose(got[..., 0], la[..., 0] / 255.0)
    np.testing.assert_array_equal(got[..., 0], got[..., 2])


def test_parse_config_rejects_malformed_line(tmp_path):
    from depth_lidar_nerf_tpu.train.config import parse_config_file

    p = tmp_path / "bad.txt"
    p.write_text("N_rand = 64\nno_ndc True\n")
    with pytest.raises(ValueError, match="no '='"):
        parse_config_file(str(p))


def test_make_scene_hard_mode(tmp_path):
    """hard=True (the non-saturating quality scene): multi-octave textures
    on every surface + extra occluders, wall implied (every ray terminates
    on geometry), loadable through the standard LLFF path."""
    import numpy as np

    from depth_lidar_nerf_tpu.data.synthetic import _trace, make_scene
    from depth_lidar_nerf_tpu.data import load_llff_data

    d = str(tmp_path / "hard")
    make_scene(d, n_images=2, H=20, W=26, focal=24.0, n_depth_points=50,
               hard=True)
    images, poses, bds, _, _ = load_llff_data(d, factor=0, bd_factor=0.75)
    assert images.shape == (2, 20, 26, 3)

    rng = np.random.default_rng(3)
    ro = np.zeros((512, 3))
    rd = rng.normal(size=(512, 3))
    rd[:, 2] = -np.abs(rd[:, 2]) - 0.3
    rgb_e, depth_e, _ = _trace(ro, rd, backdrop=True)
    rgb_h, depth_h, cls_h = _trace(ro, rd, hard=True)
    assert (depth_h < 1e4).all()  # wall: every ray hits geometry
    # Occluders make the hard depth field hit nearer surfaces somewhere.
    assert (depth_h < depth_e - 0.5).any()
    # Multi-octave texture carries more high-frequency energy: per-surface
    # color variance strictly higher than the flat-colored blobs.
    on_blob_e = rgb_e.std(axis=0).mean()
    on_blob_h = rgb_h.std(axis=0).mean()
    assert on_blob_h > 0.0 and np.isfinite(on_blob_h)
    assert cls_h.max() >= 1
