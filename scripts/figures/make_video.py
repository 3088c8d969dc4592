#!/usr/bin/env python3
"""Prediction-sequence video harness.

Rebuild of the reference's video scripts (``mask_bev_figures/
test_video_kitti.py:96-229``: run the model over consecutive scans of a
sequence, render GT + predicted BEV masks per frame, emit a video). Frames
are rendered with matplotlib (no OpenGL); the video is written with
cv2.VideoWriter when cv2 is available, else as a PNG frame directory any
ffmpeg can assemble.

Usage:
  python scripts/figures/make_video.py --config <yml> --ckpt-dir runs/<name>/checkpoints \
      [--dataset-root data/SemanticKITTI] [--num-frames 100] [--out video.mp4]
"""
from __future__ import annotations

import argparse
import pathlib

import numpy as np


def render_frame(points, preds, cfg, gt_masks=None) -> np.ndarray:
    """One BEV frame: scan points, predicted masks (and GT contours) -> RGB."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6), dpi=110)
    ax.scatter(points[:, 0], points[:, 1], s=0.2, c="#777777", linewidths=0)
    h_m, w_m = None, None
    if preds.masks.shape[0]:
        q, mh, mw = preds.masks.shape
        extent = [cfg.x_range[0], cfg.x_range[1], cfg.y_range[0], cfg.y_range[1]]
        overlay = np.zeros((mh, mw), np.float32)
        for i in range(q):
            overlay = np.maximum(overlay, preds.masks[i] * (i + 1))
        masked = np.ma.masked_where(overlay == 0, overlay)
        ax.imshow(masked, origin="lower", extent=extent, alpha=0.6,
                  cmap="tab20", interpolation="nearest")
    if gt_masks is not None and gt_masks.shape[0]:
        extent = [cfg.x_range[0], cfg.x_range[1], cfg.y_range[0], cfg.y_range[1]]
        gt_any = gt_masks.any(0).astype(np.float32)
        ax.contour(gt_any, levels=[0.5], colors="#dc3f76", origin="lower",
                   extent=extent, linewidths=1.0)
    ax.set_xlim(*cfg.x_range)
    ax.set_ylim(*cfg.y_range)
    ax.set_aspect("equal")
    ax.axis("off")
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return buf


class VideoSink:
    """cv2.VideoWriter when available; PNG frame directory otherwise."""

    def __init__(self, out_path: str, fps: int = 10):
        self.path = pathlib.Path(out_path)
        self.fps = fps
        self._writer = None
        self._frame_dir = None
        self._count = 0
        try:
            import cv2  # noqa: F401

            self._cv2 = cv2
        except ImportError:
            self._cv2 = None
            self._frame_dir = self.path.with_suffix("")
            self._frame_dir.mkdir(parents=True, exist_ok=True)

    def write(self, rgb: np.ndarray) -> None:
        if self._cv2 is not None:
            if self._writer is None:
                h, w = rgb.shape[:2]
                fourcc = self._cv2.VideoWriter_fourcc(*"mp4v")
                self._writer = self._cv2.VideoWriter(
                    str(self.path), fourcc, self.fps, (w, h))
            self._writer.write(rgb[..., ::-1])  # RGB -> BGR
        else:
            from PIL import Image

            Image.fromarray(rgb).save(
                self._frame_dir / f"frame_{self._count:06d}.png")
        self._count += 1

    def close(self) -> str:
        if self._writer is not None:
            self._writer.release()
            return str(self.path)
        return str(self._frame_dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--dataset-root", default=None)
    ap.add_argument("--split", default="valid")
    ap.add_argument("--num-frames", type=int, default=100)
    ap.add_argument("--every-nth", type=int, default=1)
    ap.add_argument("--fps", type=int, default=10)
    ap.add_argument("--out", default="maskbev_video.mp4")
    ap.add_argument("--which", default="best", choices=["best", "last"])
    args = ap.parse_args()

    from mask_bev_tpu.config import MaskBevConfig
    from mask_bev_tpu.inference import MaskBevPredictor

    cfg = MaskBevConfig.from_yaml(args.config)
    root = args.dataset_root or cfg.dataset_root or f"data/{cfg.dataset}"
    predictor = MaskBevPredictor.from_checkpoint(cfg, args.ckpt_dir,
                                                 which=args.which)

    if cfg.dataset == "kitti":
        from mask_bev_tpu.datasets.kitti.kitti_dataset import KittiDataset

        ds = KittiDataset(root, "training")
        scans = (ds[i].points for i in range(len(ds)))
    else:
        from mask_bev_tpu.datasets.semantic_kitti.dataset import (
            SemanticKittiDataset)

        ds = SemanticKittiDataset(root, args.split)
        scans = (ds[i].point_cloud for i in range(len(ds)))

    sink = VideoSink(args.out, fps=args.fps)
    written = 0
    for i, pc in enumerate(scans):
        if i % args.every_nth:
            continue
        preds = predictor.predict_scan(np.asarray(pc, np.float32))
        sink.write(render_frame(pc, preds, cfg))
        written += 1
        if written >= args.num_frames:
            break
    out = sink.close()
    print(f"wrote {written} frames -> {out}")


if __name__ == "__main__":
    main()
