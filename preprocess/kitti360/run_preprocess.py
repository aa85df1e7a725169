"""KITTI-360 preprocessing driver.

Parity: ``preprocess/KITTI360/preprocess_kitti.py:18-96`` — yaml config, per
image DeepLab segmentation -> class maps + sky coords -> LiDAR depth
completion -> poses_bounds.npy / depth_gt.npy / segmentation_gt.npy.

Usage: ``python -m preprocess.kitti360.run_preprocess [config.yaml]``
"""

from __future__ import annotations

import os
import sys

import numpy as np
import yaml

from preprocess.kitti360.dataset import Kitti360Dataset
from preprocess.kitti360 import segmentor as seg


def main(config_path: str = "config.yaml"):
    with open(config_path) as f:
        config = yaml.safe_load(f)

    image_folder = config["image_folder"]
    out_dir = config.get("out_dir", "./train_data")
    files = sorted(f for f in os.listdir(image_folder) if f.endswith(".png"))
    frames = sorted(int(f.split(".png")[0]) for f in files)

    import imageio.v2 as imageio

    model = seg.DeepLabSegmentor(config["segmentor_config"],
                                 config["segmentor_weights"])
    absent = np.array(config.get("absent_classes", [11, 12, 14, 15, 16]))

    seg_gt, sky = [], []
    for f in files:
        img = np.asarray(imageio.imread(os.path.join(image_folder, f)))[..., :3]
        logits = model.segment_image(img)
        logits = seg.zero_out_absent_classes(absent, logits)
        preds = seg.class_predictions(seg.softmax_probabilities(logits))
        seg_gt.append(preds)
        sky.append(seg.sky_coords(preds))

    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "segmentation_gt.npy"),
            {"segmentations": np.stack(seg_gt), "num_classes": seg.NUM_CLASSES},
            allow_pickle=True)

    ds = Kitti360Dataset(config["seq_id"], config["cam_id"],
                         config.get("kitti360_path", "../../data/kitti/KITTI-360"))
    ds.create_poses_bounds_and_gt_depths(frames, sky, out_dir=out_dir)
    print("wrote artifacts to", out_dir)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "config.yaml")
