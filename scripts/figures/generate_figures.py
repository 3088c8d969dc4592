#!/usr/bin/env python3
"""Inference figure generation (reference ``mask_bev_figures`` role).

Loads a trained checkpoint, runs the phase API
(forward_encode -> forward_backbone -> pred_masks, like reference
``test_figures.py:74-76``) on validation scans, and writes BEV figures:
the input scan, the GT instance map, and thresholded predicted masks.
"""
from __future__ import annotations

import argparse
import pathlib

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--data-root", required=True)
    p.add_argument("--out-dir", default="figures")
    p.add_argument("--num-scans", type=int, default=4)
    p.add_argument("--which", default="best")
    args = p.parse_args()

    from mask_bev_tpu.config import MaskBevConfig
    from mask_bev_tpu.inference import MaskBevPredictor
    from mask_bev_tpu.visualization.bev_viz import (
        plot_instance_mask, plot_point_cloud_bev, plot_query_masks)
    from train_mask_bev import build_datamodule

    cfg = MaskBevConfig.from_yaml(args.config)
    dm = build_datamodule(cfg, args.data_root)
    predictor = MaskBevPredictor.from_checkpoint(cfg, args.ckpt_dir,
                                                 which=args.which)
    out = pathlib.Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)

    batch = next(iter(dm.val_batches(seed=0)))
    preds = predictor.predict_batch(batch["points"], batch["point_mask"])
    for i in range(min(args.num_scans, len(preds))):
        pts = batch["points"][i][batch["point_mask"][i]]
        plot_point_cloud_bev(pts, cfg.x_range, cfg.y_range,
                             path=str(out / f"scan_{i}.png"))
        gt = np.zeros(cfg.grid_hw, np.int64)
        for g, mask in enumerate(batch["gt_masks"][i]):
            gt[mask] = g + 1
        plot_instance_mask(gt, path=str(out / f"gt_{i}.png"))
        if len(preds[i].mask_probs):
            plot_query_masks(preds[i].mask_probs, preds[i].scores,
                             path=str(out / f"pred_{i}.png"))
        print(f"scan {i}: {len(preds[i].scores)} detections, "
              f"{len(preds[i].boxes)} boxes")
    print(f"figures in {out}")


if __name__ == "__main__":
    main()
