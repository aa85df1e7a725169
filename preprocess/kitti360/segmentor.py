"""Semantic segmentation helpers + optional DeepLab GT generator.

Parity: ``preprocess/KITTI360/segmentor.py``. The numpy helper (Cityscapes
19-class palette, class zeroing, softmax/argmax, NN downsample, sky-coord
extraction — class 10) has no torch dependency and is what the train-side
loaders use. The DeepLabV3+ predictor needs detectron2, which this image does
not ship; it is gated and raises a clear error, and any pre-generated
``segmentation_gt.npy`` works without it.
"""

from __future__ import annotations

import numpy as np

CITYSCAPES_PALETTE = np.array([
    [128, 64, 128],   # 0 road
    [244, 35, 232],   # 1 sidewalk
    [70, 70, 70],     # 2 building
    [102, 102, 156],  # 3 wall
    [190, 153, 153],  # 4 fence
    [153, 153, 153],  # 5 pole
    [250, 170, 30],   # 6 traffic light
    [220, 220, 0],    # 7 traffic sign
    [107, 142, 35],   # 8 vegetation
    [152, 251, 152],  # 9 terrain
    [70, 130, 180],   # 10 sky
    [220, 20, 60],    # 11 person
    [255, 0, 0],      # 12 rider
    [0, 0, 142],      # 13 car
    [0, 0, 70],       # 14 truck
    [0, 60, 100],     # 15 bus
    [0, 80, 100],     # 16 train
    [0, 0, 230],      # 17 motorcycle
    [119, 11, 32],    # 18 bicycle
], np.uint8)

SKY_CLASS = 10
NUM_CLASSES = 19


def zero_out_absent_classes(classes: np.ndarray, logits: np.ndarray) -> np.ndarray:
    """Zero logits of classes known absent from the scene (segmentor.py:60-62)."""
    logits = logits.copy()
    logits[np.asarray(classes)] = 0
    return logits


def softmax_probabilities(logits: np.ndarray) -> np.ndarray:
    """Class-axis softmax over [C, H, W] logits (segmentor.py:64-65)."""
    m = logits.max(axis=0, keepdims=True)
    e = np.exp(logits - m)
    return e / e.sum(axis=0, keepdims=True)


def class_predictions(probs: np.ndarray) -> np.ndarray:
    return np.argmax(probs, axis=0)


def downsample_predictions(preds: np.ndarray, H: int, W: int) -> np.ndarray:
    """Nearest-neighbour class-map resize, [N, h, w] or [h, w]."""
    from depth_lidar_nerf_tpu.data.semantic import nearest_downsample

    if preds.ndim == 2:
        return nearest_downsample(preds[None], H, W)[0]
    return nearest_downsample(preds, H, W)


def segmented_image(preds: np.ndarray) -> np.ndarray:
    """Class map -> RGB palette visualization (segmentor.py:86-89)."""
    return CITYSCAPES_PALETTE[np.asarray(preds, int)]


def sky_coords(preds: np.ndarray) -> np.ndarray:
    """(x, y) pixel coords of sky pixels (segmentor.py:91-96)."""
    yy, xx = np.nonzero(np.asarray(preds) == SKY_CLASS)
    return np.stack([xx, yy], axis=-1)


class DeepLabSegmentor:
    """Detectron2 DeepLabV3+ predictor (requires detectron2 at runtime)."""

    def __init__(self, config_path: str, weights_path: str):
        try:
            from detectron2.config import get_cfg
            from detectron2.engine import DefaultPredictor
            from detectron2.projects.deeplab import add_deeplab_config
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "detectron2 is not installed in this environment; generate "
                "segmentation_gt.npy offline or install detectron2") from e
        cfg = get_cfg()
        add_deeplab_config(cfg)
        cfg.merge_from_file(config_path)
        cfg.MODEL.WEIGHTS = weights_path
        cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.8
        cfg.INPUT.CROP.ENABLED = False
        cfg.freeze()
        self.predictor = DefaultPredictor(cfg)

    def segment_image(self, image_rgb: np.ndarray) -> np.ndarray:
        """RGB image -> [19, H, W] logits (detectron2 wants BGR)."""
        out = self.predictor(image_rgb[:, :, ::-1])
        return out["sem_seg"].cpu().numpy()
