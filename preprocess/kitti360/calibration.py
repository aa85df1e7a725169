"""KITTI-360 calibration file parsers.

Parity: ``preprocess/KITTI360/loadCalibration.py:11-86`` — named-matrix text
files (``key: v v v ...``), rigid [3,4] extrinsics homogenized with a
[0,0,0,1] row, and the ``perspective.txt`` intrinsics table.
"""

from __future__ import annotations

import os

import numpy as np

_BOTTOM = np.array([[0.0, 0.0, 0.0, 1.0]])


def _require(path: str):
    if not os.path.isfile(path):
        raise FileNotFoundError(path)


def read_named_matrix(path: str, name: str, rows: int, cols: int):
    """Find ``name: <rows*cols floats>`` in a calibration text file."""
    _require(path)
    with open(path) as f:
        for line in f:
            if line.startswith(name):
                vals = line.split(":", 1)[1].split()
                if len(vals) != rows * cols:
                    raise ValueError(
                        f"{name} in {path}: expected {rows * cols} values, "
                        f"got {len(vals)}")
                return np.array([float(x) for x in vals]).reshape(rows, cols)
    return None


def load_calibration_camera_to_pose(path: str) -> dict:
    """{'image_00'..'image_03': [4,4] cam->GPS/IMU} (loadCalibration.py:38-54)."""
    out = {}
    for cam in ("image_00", "image_01", "image_02", "image_03"):
        m = read_named_matrix(path, cam, 3, 4)
        if m is None:
            raise ValueError(f"{cam} missing from {path}")
        out[cam] = np.concatenate([m, _BOTTOM], axis=0)
    return out


def load_calibration_rigid(path: str) -> np.ndarray:
    """[4,4] rigid transform from a bare 12-value file (loadCalibration.py:57-62)."""
    _require(path)
    return np.concatenate([np.loadtxt(path).reshape(3, 4), _BOTTOM], axis=0)


def load_perspective_intrinsics(path: str) -> dict:
    """P_rect/R_rect pairs for both perspective cams (loadCalibration.py:65-86)."""
    out = {}
    for cam in ("00", "01"):
        P = read_named_matrix(path, f"P_rect_{cam}", 3, 4)
        R = read_named_matrix(path, f"R_rect_{cam}", 3, 3)
        if P is not None:
            out[f"P_rect_{cam}"] = np.concatenate([P, _BOTTOM], axis=0)
        if R is not None:
            out[f"R_rect_{cam}"] = R
    return out
