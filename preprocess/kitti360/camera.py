"""KITTI-360 camera models: rectified perspective + MEI fisheye.

Parity: ``preprocess/KITTI360/cameras.py`` — intrinsics parsing from
``perspective.txt`` (P_rect/R_rect/S_rect, ``cameras.py:114-142``), the
cam2world chain ``pose @ camToPose @ R_rect^-1`` for rectified cameras
(``cameras.py:36-44``), K-projection with |z| division and integer rounding
(``cam2imageNew``, ``cameras.py:161-175``), and the MEI fisheye model
(``cameras.py:200-226``).
"""

from __future__ import annotations

import os

import numpy as np

from preprocess.kitti360.calibration import (
    load_calibration_camera_to_pose,
    read_named_matrix,
)


class _CameraBase:
    def _load_poses(self):
        arr = np.atleast_2d(np.loadtxt(self.pose_file))
        frames = arr[:, 0].astype(int)
        poses = arr[:, 1:].reshape(-1, 3, 4)
        bottom = np.array([[0.0, 0.0, 0.0, 1.0]])
        self.cam2world = {}
        self.frames = frames
        for frame, p in zip(frames, poses):
            p44 = np.concatenate([p, bottom], axis=0)
            if self.cam_id in (0, 1):
                # GPS/IMU->world @ cam->GPS/IMU @ rect->unrect
                self.cam2world[frame] = p44 @ self.cam_to_pose @ np.linalg.inv(self.R_rect)
            else:
                self.cam2world[frame] = p44 @ self.cam_to_pose

    def world2cam(self, points: np.ndarray, frame: int) -> np.ndarray:
        """World points [N, 3] -> camera frame [3, N]."""
        c2w = self.cam2world[frame]
        R, T = c2w[:3, :3], c2w[:3, 3]
        return R.T @ (points - T).T


class PerspectiveCamera(_CameraBase):
    """Rectified pinhole camera (cam_id 0 or 1)."""

    def __init__(self, kitti360_root: str, sequence: str, cam_id: int = 0):
        if cam_id not in (0, 1):
            raise ValueError("perspective cam_id must be 0 or 1")
        self.cam_id = cam_id
        calib = os.path.join(kitti360_root, "calibration")
        self.pose_file = os.path.join(kitti360_root, "data_poses", sequence,
                                      "poses.txt")
        self._load_intrinsics(os.path.join(calib, "perspective.txt"))
        self.cam_to_pose = load_calibration_camera_to_pose(
            os.path.join(calib, "calib_cam_to_pose.txt"))[f"image_{cam_id:02d}"]
        if os.path.exists(self.pose_file):
            self._load_poses()

    def _load_intrinsics(self, path: str):
        tag = f"{self.cam_id:02d}"
        P = read_named_matrix(path, f"P_rect_{tag}", 3, 4)
        R = read_named_matrix(path, f"R_rect_{tag}", 3, 3)
        S = read_named_matrix(path, f"S_rect_{tag}", 1, 2)
        if P is None or R is None or S is None:
            raise ValueError(f"incomplete intrinsics for cam {tag} in {path}")
        self.K = P  # [3, 4]
        self.R_rect = np.eye(4)
        self.R_rect[:3, :3] = R
        self.width, self.height = int(S[0, 0]), int(S[0, 1])
        self.focal = P[0, 0]
        self.x0, self.y0 = P[0, 2], P[1, 2]

    def project(self, points_cam: np.ndarray):
        """Camera-frame points [3, N] -> integer pixel (u, v) and depth.

        Matches cam2imageNew (cameras.py:161-175): divide by |z| (so
        behind-camera points keep negative depth and flip into frame for
        masking), round to nearest integer pixel.
        """
        proj = self.K[:3, :3] @ points_cam
        depth = proj[2].copy()
        depth[depth == 0] = -1e-6
        u = np.round(proj[0] / np.abs(depth)).astype(np.int64)
        v = np.round(proj[1] / np.abs(depth)).astype(np.int64)
        return u, v, depth


class FisheyeCamera(_CameraBase):
    """MEI unified camera model (cam_id 2 or 3), intrinsics from the
    OpenCV-YAML files."""

    def __init__(self, kitti360_root: str, sequence: str, cam_id: int = 2):
        if cam_id not in (2, 3):
            raise ValueError("fisheye cam_id must be 2 or 3")
        self.cam_id = cam_id
        calib = os.path.join(kitti360_root, "calibration")
        self.pose_file = os.path.join(kitti360_root, "data_poses", sequence,
                                      "poses.txt")
        self._load_intrinsics(os.path.join(calib, f"image_{cam_id:02d}.yaml"))
        self.cam_to_pose = load_calibration_camera_to_pose(
            os.path.join(calib, "calib_cam_to_pose.txt"))[f"image_{cam_id:02d}"]
        if os.path.exists(self.pose_file):
            self._load_poses()

    def _load_intrinsics(self, path: str):
        import yaml

        with open(path) as f:
            text = f.read()
        # OpenCV YAML header fixups (cameras.py:9-20).
        text = text.split("\n", 1)[1] if text.startswith("%YAML") else text
        import re

        text = re.sub(r":([^ \n])", r": \1", text)
        fi = yaml.safe_load(text)
        self.fi = fi
        self.width = fi["image_width"]
        self.height = fi["image_height"]

    def project(self, points_cam: np.ndarray):
        """MEI model: unit-sphere projection + radial distortion
        (cameras.py:200-226)."""
        p = points_cam.T.astype(np.float64)
        norm = np.linalg.norm(p, axis=1)
        x, y, z = p[:, 0] / norm, p[:, 1] / norm, p[:, 2] / norm
        xi = self.fi["mirror_parameters"]["xi"]
        x = x / (z + xi)
        y = y / (z + xi)
        k1 = self.fi["distortion_parameters"]["k1"]
        k2 = self.fi["distortion_parameters"]["k2"]
        r2 = x * x + y * y
        radial = 1 + k1 * r2 + k2 * r2 * r2
        x, y = x * radial, y * radial
        pp = self.fi["projection_parameters"]
        u = pp["gamma1"] * x + pp["u0"]
        v = pp["gamma2"] * y + pp["v0"]
        depth = norm * np.sign(p[:, 2])
        return u, v, depth
