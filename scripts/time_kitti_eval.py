"""Time the official KITTI eval at full-split scale (VERDICT r4 #7).

Generates a synthetic val split shaped like KITTI's (4,071 frames for the
3,769-image val list plus margin; per-frame gt/dt counts drawn to match the
split's ~6.9 labeled objects/frame), then times
``get_official_eval_result`` end-to-end for the car class across all three
metrics x three difficulties. The reference needed numba ``parallel=True``
kernels plus ``fused_compute_statistics`` for this workload (reference
kitti_eval.py:266,396); our budget is pure numpy <= 2 min via the
threshold-vectorized matcher + per-metric overlap cache.

Usage: python scripts/time_kitti_eval.py [--frames 4071] [--out out.json]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

from mask_bev_tpu.evaluation.kitti_eval import (
    boxes_to_annos, get_coco_eval_result, get_official_eval_result,
    gt_boxes_to_annos)


def synth_split(frames: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    gts, dts = [], []
    for _ in range(frames):
        n = int(rng.poisson(6.9))
        centers = np.column_stack([
            rng.uniform(3, 70, n), rng.uniform(-30, 30, n), np.zeros(n)])
        yaws = rng.uniform(-np.pi, np.pi, n)
        dims = np.column_stack([
            rng.uniform(3.2, 4.8, n), rng.uniform(1.5, 2.0, n),
            rng.uniform(1.4, 1.8, n)])
        names = rng.choice(["Car", "Car", "Car", "Van", "Pedestrian"], n)
        occl = rng.choice([0, 0, 1, 2], n)
        trunc = rng.uniform(0, 0.4, n) * (rng.random(n) < 0.3)
        h_px = rng.uniform(20, 120, n)
        bbox = np.column_stack(
            [np.zeros(n), np.zeros(n), np.full(n, 60.0), h_px])
        gts.append(gt_boxes_to_annos(centers, dims, yaws, names,
                                     occluded=occl, truncated=trunc,
                                     bbox=bbox))
        # detections: jittered gts (some dropped) + false positives
        keep = rng.random(n) < 0.85
        c = centers[keep] + rng.normal(0, 0.3, (keep.sum(), 3))
        y = yaws[keep] + rng.normal(0, 0.1, keep.sum())
        nfp = int(rng.poisson(1.5))
        cf = np.column_stack([rng.uniform(3, 70, nfp),
                              rng.uniform(-30, 30, nfp), np.zeros(nfp)])
        yf = rng.uniform(-np.pi, np.pi, nfp)
        cc = np.concatenate([c, cf])
        yy = np.concatenate([y, yf])
        m = len(cc)
        boxes = np.column_stack([cc[:, 0], cc[:, 1], np.full(m, 1.7),
                                 np.full(m, 4.0), yy])
        scores = np.concatenate([rng.uniform(0.5, 1.0, keep.sum()),
                                 rng.uniform(0.05, 0.6, nfp)])
        dts.append(boxes_to_annos(boxes, scores))
    return gts, dts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4071)
    ap.add_argument("--coco", action="store_true",
                    help="also time the COCO overlap sweep")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    t0 = time.perf_counter()
    gts, dts = synth_split(args.frames)
    t_gen = time.perf_counter() - t0
    n_gt = sum(len(g["name"]) for g in gts)
    n_dt = sum(len(d["name"]) for d in dts)
    print(f"split: {args.frames} frames, {n_gt} gts, {n_dt} dts "
          f"(gen {t_gen:.1f}s)")

    t0 = time.perf_counter()
    res = get_official_eval_result(gts, dts, current_classes=(0,))
    t_off = time.perf_counter() - t0
    print(f"official eval (car, 3 metrics x 3 diff): {t_off:.1f}s")
    print(json.dumps(res))

    out = {"frames": args.frames, "total_gt": n_gt, "total_dt": n_dt,
           "official_eval_s": round(t_off, 2), "result": res}
    if args.coco:
        t0 = time.perf_counter()
        coco = get_coco_eval_result(gts, dts, current_classes=(0,))
        t_coco = time.perf_counter() - t0
        print(f"coco sweep eval: {t_coco:.1f}s")
        out["coco_eval_s"] = round(t_coco, 2)
        out["coco_result"] = coco
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
