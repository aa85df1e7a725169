"""KITTI-360 dataset adapter: LiDAR -> per-image depth supervision artifacts.

Parity: ``preprocess/KITTI360/Kitti360Dataset_new.py`` (v2, with IP-Basic
depth completion + sky stamping) and the raw-LiDAR path of
``Kitti360Dataset.py`` (v1). Pipeline per frame:

velodyne .bin -> TrVeloToRect (calibration chain, ``Kitti360Dataset_new.py:
134-158``) -> K projection with in-image/positive-depth mask (``:162-176``)
-> [optional] rasterize + ``fill_in_multiscale(extrapolate=True)`` + stamp sky
pixels with 9999999 (``:191-244``) -> flatten to (coord, depth) lists; bounds
are the .1/99.9 depth percentiles (``:188-193``); writes ``poses_bounds.npy``
(cam2world rows + hwf + bounds) and ``depth_gt.npy``.
"""

from __future__ import annotations

import os

import numpy as np

from preprocess.kitti360.calibration import (
    load_calibration_camera_to_pose,
    load_calibration_rigid,
)
from preprocess.kitti360.camera import PerspectiveCamera
from preprocess.kitti360.depth_completion import fill_in_multiscale

SKY_DEPTH = 9999999.0


class Kitti360Dataset:
    def __init__(self, seq: int = 0, cam_id: int = 0,
                 kitti360_path: str = "../../data/kitti/KITTI-360"):
        self.root = kitti360_path
        self.cam_id = cam_id
        self.sequence = f"2013_05_28_drive_{seq:04d}_sync"
        pose_dir = os.path.join(kitti360_path, "data_poses", self.sequence)
        self.cam0_to_world_file = os.path.join(pose_dir,
                                               f"cam{cam_id}_to_world.txt")
        self.poses_file = os.path.join(pose_dir, "poses.txt")
        self.velodyne_dir = os.path.join(kitti360_path, "data_3d_raw",
                                         self.sequence, "velodyne_points",
                                         "data")
        self.image_dir = os.path.join(kitti360_path, "data_2d_raw",
                                      self.sequence, f"image_{cam_id:02d}",
                                      "data_rect")
        self.oxts_dir = os.path.join(kitti360_path, "data_poses_oxts",
                                     "data_poses", self.sequence, "oxts",
                                     "data")
        calib = os.path.join(kitti360_path, "calibration")
        self.cam_to_velo_file = os.path.join(calib, "calib_cam_to_velo.txt")
        self.cam_to_pose_file = os.path.join(calib, "calib_cam_to_pose.txt")
        self.camera = PerspectiveCamera(kitti360_path, self.sequence, cam_id)
        # Parse-once caches: a full sequence's cam0_to_world.txt has
        # thousands of rows and the calibration chain is frame-independent;
        # re-parsing them per frame made preprocessing O(frames x rows).
        self._cam0_poses: dict | None = None
        self._velo_to_rect: np.ndarray | None = None

    # ------------------------------------------------------------- loaders

    def image_path(self, frame: int) -> str:
        return os.path.join(self.image_dir, f"{frame:010d}.png")

    def load_velodyne(self, frame: int) -> np.ndarray:
        """Homogeneous LiDAR points [N, 4] (intensity replaced by 1)."""
        path = os.path.join(self.velodyne_dir, f"{frame:010d}.bin")
        pcd = np.fromfile(path, dtype=np.float32).reshape(-1, 4).copy()
        pcd[:, 3] = 1.0
        return pcd

    def cam2world(self, frame: int) -> np.ndarray:
        if not os.path.exists(self.cam0_to_world_file):
            # Raw-OXTS fallback: reconstruct the pose from the GPS/IMU
            # record when the devkit's cam0_to_world.txt is absent.
            return self.cam2world_from_oxts(frame)
        if self._cam0_poses is None:
            arr = np.atleast_2d(np.loadtxt(self.cam0_to_world_file))
            self._cam0_poses = dict(zip(
                arr[:, 0].astype(int), arr[:, 1:].reshape(-1, 4, 4)))
        if frame not in self._cam0_poses:
            raise KeyError(f"frame {frame} has no cam{self.cam_id}_to_world pose")
        return self._cam0_poses[frame]

    def oxts_pose(self, frame: int) -> np.ndarray:
        """IMU/GPS pose of one frame from its raw OXTS record
        (``convertOxtsToPose``, Kitti360Dataset.py:386-456)."""
        path = os.path.join(self.oxts_dir, f"{frame:010d}.txt")
        return convert_oxts_to_pose(np.loadtxt(path))[0]

    def cam2world_from_oxts(self, frame: int) -> np.ndarray:
        """cam->world from the raw OXTS chain: IMU pose composed with the
        cam-to-IMU extrinsics and the rectifying rotation (the devkit's
        ``cam2world = pose @ camToPose @ inv(R_rect)`` for perspective
        cameras)."""
        cam_to_pose = load_calibration_camera_to_pose(self.cam_to_pose_file)
        key = f"image_{self.cam_id:02d}"
        return (self.oxts_pose(frame) @ cam_to_pose[key]
                @ np.linalg.inv(self.camera.R_rect))

    # ------------------------------------------------------ transform chain

    def velo_to_rect(self) -> np.ndarray:
        """Tr(velodyne -> rectified camera): the calibration chain of
        Kitti360Dataset_new.py:134-150. Frame-independent, computed once."""
        if self._velo_to_rect is None:
            cam0_to_velo = load_calibration_rigid(self.cam_to_velo_file)
            cam_to_pose = load_calibration_camera_to_pose(self.cam_to_pose_file)
            key = f"image_{self.cam_id:02d}"
            camk_to_cam0 = (np.linalg.inv(cam_to_pose["image_00"])
                            @ cam_to_pose[key])
            cam_to_velo = cam0_to_velo @ camk_to_cam0
            velo_to_cam = np.linalg.inv(cam_to_velo)
            self._velo_to_rect = self.camera.R_rect @ velo_to_cam
        return self._velo_to_rect

    # ------------------------------------------------------------ pipeline

    def project_lidar(self, frame: int):
        """Project one sweep. Returns (u, v, depth) of in-image hits."""
        pcd = self.load_velodyne(frame)
        pts_cam = (self.velo_to_rect() @ pcd.T).T[:, :3]
        u, v, depth = self.camera.project(pts_cam.T)
        mask = ((u >= 0) & (u < self.camera.width)
                & (v >= 0) & (v < self.camera.height) & (depth > 0))
        return u[mask], v[mask], depth[mask]

    def depth_and_coords(self, frame: int, sky_coords=None, complete=True):
        """(coords [M,2], depth [M], min_depth, max_depth) for one frame."""
        u, v, depth = self.project_lidar(frame)

        if not complete:
            coords = np.stack([u, v], axis=-1)
            lo, hi = np.percentile(depth, 0.1), np.percentile(depth, 99.9)
            return coords, depth, lo, hi

        grid = np.zeros((self.camera.height, self.camera.width), np.float32)
        grid[v, u] = depth
        dense = fill_in_multiscale(grid, max_depth=depth.max() + 1,
                                   extrapolate=True)
        if sky_coords is not None and len(sky_coords):
            sky = np.asarray(sky_coords)
            dense[sky[:, 1], sky[:, 0]] = SKY_DEPTH

        yy, xx = np.nonzero(dense != 0)
        depths = dense[yy, xx]
        coords = np.stack([xx, yy], axis=-1)
        # Percentile bounds are deliberately computed AFTER the sky stamp:
        # the reference recomputes them from complete_depth's output
        # (Kitti360Dataset_new.py:191-194), whose flattened array already
        # carries SKY_DEPTH, so a frame with >0.1% sky gets hi = SKY_DEPTH
        # there too. Parity over plausibility.
        lo, hi = np.percentile(depths, 0.1), np.percentile(depths, 99.9)
        return coords, depths, lo, hi

    def create_poses_bounds_and_gt_depths(self, frames, sky_coords=None,
                                          out_dir: str = "./train_data",
                                          complete: bool = True):
        """Write poses_bounds.npy + depth_gt.npy
        (Kitti360Dataset_new.py:99-127)."""
        cam = self.camera
        hwf = np.array([cam.height, cam.width, cam.focal], np.float64).reshape(3, 1)

        rows, depth_list = [], []
        for i, frame in enumerate(frames):
            pose = self.cam2world(frame)[:3, :]
            sc = sky_coords[i] if sky_coords is not None else None
            coords, depths, lo, hi = self.depth_and_coords(frame, sc, complete)
            depth_list.append({
                "depth": np.asarray(depths),
                "coord": np.asarray(coords, np.float64),
                "weight": np.ones(len(depths)),
            })
            row = np.concatenate([pose, hwf], axis=1).reshape(-1)
            rows.append(np.concatenate([row, [lo, hi]]))

        os.makedirs(out_dir, exist_ok=True)
        np.save(os.path.join(out_dir, "poses_bounds.npy"), np.stack(rows))
        np.save(os.path.join(out_dir, "depth_gt.npy"),
                np.array(depth_list, dtype=object), allow_pickle=True)
        return np.stack(rows), depth_list


# ------------------------------------------------------------------- OXTS

EARTH_RADIUS = 6378137.0


def lat_to_scale(lat: float) -> float:
    """Mercator scale from latitude (preprocess_utils.py:22-25)."""
    return np.cos(lat * np.pi / 180.0)


def latlon_to_mercator(lat, lon, scale):
    """lat/lon -> mercator meters (preprocess_utils.py:6-11)."""
    mx = scale * lon * np.pi * EARTH_RADIUS / 180.0
    my = scale * EARTH_RADIUS * np.log(np.tan((90.0 + lat) * np.pi / 360.0))
    return mx, my


def mercator_to_latlon(mx, my, scale):
    lon = mx * 180.0 / (scale * np.pi * EARTH_RADIUS)
    lat = 360.0 / np.pi * np.arctan(np.exp(my / (scale * EARTH_RADIUS))) - 90.0
    return lat, lon


# Fixed Mercator origin used by the whole dataset: a lake in Karlsruhe
# (Kitti360Dataset.py:404-411).
KARLSRUHE_ORIGIN = (48.9843445, 8.4295857)


def oxts_rotation(roll: float, pitch: float, heading: float) -> np.ndarray:
    """OXTS RT3000 body->nav rotation R = Rz(heading) Ry(pitch) Rx(roll)
    (Kitti360Dataset.py:427-437; OXTS manual page 71/92)."""
    cx, sx = np.cos(roll), np.sin(roll)
    cy, sy = np.cos(pitch), np.sin(pitch)
    cz, sz = np.cos(heading), np.sin(heading)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def convert_oxts_to_pose(oxts, origin_latlon=KARLSRUHE_ORIGIN) -> np.ndarray:
    """Raw OXTS records -> metric 4x4 poses, frame-postprocessed.

    ``oxts`` is one record ``[>=6]`` or a batch ``[N, >=6]`` with columns
    (lat, lon, alt, roll, pitch, heading, ...). The end-to-end chain of
    ``convertOxtsToPose`` (Kitti360Dataset.py:386-456): Mercator projection
    at the fixed origin's scale, OXTS Euler rotation, origin-relative
    translation, then the x=forward,y=right,z=down -> x=down,y=right,
    z=backwards frame conversion of :func:`postprocess_poses`.
    """
    records = np.atleast_2d(np.asarray(oxts, np.float64))
    scale = lat_to_scale(origin_latlon[0])
    ox, oy = latlon_to_mercator(origin_latlon[0], origin_latlon[1], scale)
    origin = np.array([ox, oy, 0.0])

    poses = []
    for r in records:
        tx, ty = latlon_to_mercator(r[0], r[1], scale)
        t = np.array([tx, ty, r[2]]) - origin
        R = oxts_rotation(r[3], r[4], r[5])
        poses.append(np.vstack([np.hstack([R, t[:, None]]),
                                [0.0, 0.0, 0.0, 1.0]]))
    return np.stack([np.asarray(p) for p in postprocess_poses(poses)])


def postprocess_poses(poses):
    """OXTS pose coordinate-frame conversion (preprocess_utils.py:28-47):
    x=forward,y=right,z=down  ->  x=down,y=right,z=backwards."""
    R = np.array([[0, 0, 1, 0], [0, 1, 0, 0], [-1, 0, 0, 0], [0, 0, 0, 1.0]])
    out = []
    for P in poses:
        if len(np.atleast_1d(P)) == 0:
            out.append([])
            continue
        out.append((R @ np.asarray(P).T).T)
    return out
