"""KITTI-360 preprocessing: calibration, LiDAR projection, depth completion.

Offline host-side pipeline producing the training artifacts
(``poses_bounds.npy``, ``depth_gt.npy``, ``segmentation_gt.npy``) consumed by
the LLFF-format loaders. Role of the reference's ``preprocess/KITTI360/``
package; pure numpy/cv2, no torch on this path (the optional DeepLab
segmentor is gated behind detectron2 availability).
"""

from preprocess.kitti360.calibration import (
    load_calibration_camera_to_pose,
    load_calibration_rigid,
    load_perspective_intrinsics,
)
from preprocess.kitti360.camera import PerspectiveCamera, FisheyeCamera
from preprocess.kitti360.dataset import Kitti360Dataset
from preprocess.kitti360 import depth_completion

__all__ = [
    "load_calibration_camera_to_pose",
    "load_calibration_rigid",
    "load_perspective_intrinsics",
    "PerspectiveCamera",
    "FisheyeCamera",
    "Kitti360Dataset",
    "depth_completion",
]
