#!/usr/bin/env python3
"""Build the GT-paste sample bank for KITTI ObjectSample augmentation.

Rebuild of reference ``scripts/generate_kitti_object_sampler.py:10-29``:
every labeled object with >= 5 interior LiDAR points becomes a sample
(its points + box), pickled to ``<root>/samples.pkl`` in the dict format
consumed by :class:`mask_bev_tpu.augmentations.kitti_augmentations.ObjectSample`.
"""
from __future__ import annotations

import argparse
import pathlib
import pickle

import numpy as np

from mask_bev_tpu.augmentations.box_ops import points_in_rbbox
from mask_bev_tpu.datasets.kitti.kitti_dataset import KittiDataset

MIN_PTS = 5


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="data/KITTI")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    dataset = KittiDataset(args.root, "training")
    samples = []
    for idx in range(len(dataset)):
        frame = dataset[idx]
        boxes = frame.boxes
        if len(boxes) == 0:
            continue
        member = points_in_rbbox(
            frame.points, boxes.center, boxes.dims[:, :2], boxes.yaw,
            z0=boxes.center[:, 2], heights=boxes.dims[:, 2])
        for i in range(len(boxes)):
            m = member[:, i]
            if m.sum() >= MIN_PTS:
                samples.append({
                    "points": frame.points[m].astype(np.float32),
                    "center": boxes.center[i].copy(),
                    "dims": boxes.dims[i].copy(),
                    "yaw": float(boxes.yaw[i]),
                    "type": int(boxes.types[i]),
                })
        if idx % 500 == 0:
            print(f"{idx}/{len(dataset)} frames, {len(samples)} samples")

    out = pathlib.Path(args.out or (pathlib.Path(args.root) / "samples.pkl"))
    with open(out, "wb") as f:
        pickle.dump(samples, f)
    print(f"wrote {len(samples)} samples to {out}")


if __name__ == "__main__":
    main()
