#!/usr/bin/env python3
"""Warm the SemanticKITTI GT-mask disk cache.

Rebuild of reference ``scripts/generate_semantic_kitti_mask_cache.py:27-29``
(which fans out over a 32-process pool). This host has few cores; default is
sequential with an optional ``--processes`` pool.
"""
from __future__ import annotations

import argparse
import multiprocessing


def _build(args):
    from mask_bev_tpu.datasets.semantic_kitti.dataset import (
        SemanticKittiSequenceDataset)
    from mask_bev_tpu.datasets.semantic_kitti.mask_data import (
        SemanticKittiMaskDataset)
    from mask_bev_tpu.datasets.semantic_kitti.taxonomy import RawLabel

    seq = SemanticKittiSequenceDataset(
        args.root, args.split, included_labels=[RawLabel.CAR])
    return SemanticKittiMaskDataset(
        seq, tuple(args.x_range), tuple(args.y_range), tuple(args.z_range),
        args.voxel_size, remove_unseen=True, min_points=args.min_points)


def _worker(payload):
    args, indices = payload
    ds = _build(args)
    for i in indices:
        ds[i]
    return len(indices)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="data/SemanticKITTI")
    p.add_argument("--split", default="train")
    p.add_argument("--x-range", nargs=2, type=float, default=[-40, 40])
    p.add_argument("--y-range", nargs=2, type=float, default=[-40, 40])
    p.add_argument("--z-range", nargs=2, type=float, default=[-20, 20])
    p.add_argument("--voxel-size", type=float, default=0.16)
    p.add_argument("--min-points", type=int, default=1)
    p.add_argument("--processes", type=int, default=1)
    args = p.parse_args()

    ds = _build(args)
    n = len(ds)
    if args.processes <= 1:
        for i in range(n):
            ds[i]
            if i % 100 == 0:
                print(f"{i}/{n} (hit ratio {ds.cache_hit_ratio:.2f})")
    else:
        chunks = [(args, list(range(i, n, args.processes)))
                  for i in range(args.processes)]
        with multiprocessing.Pool(args.processes) as pool:
            pool.map(_worker, chunks)
    print(f"cached {n} masks")


if __name__ == "__main__":
    main()
