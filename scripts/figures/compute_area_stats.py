#!/usr/bin/env python3
"""Footprint-completion area analysis figures.

Rebuild of reference ``scripts/figures/compute_area_{stats,pred,completion,
no_completion}.py``: compare complete-mask areas (multi-scan accumulated GT)
vs single-scan GT areas vs predicted areas, and plot the
``A_pred / A_complete`` histogram the paper reports (mean μ computed from the
data instead of the reference's hardcoded 1.29).

Inputs are pickles produced by :class:`mask_bev_tpu.evaluation.
detection_metric.MaskArea` (pred) and by :func:`compute_gt_areas` below.
"""
from __future__ import annotations

import argparse
import pickle
from typing import Dict


def compute_gt_areas(root: str, split: str = "valid",
                     single_scan: bool = False) -> list:
    """Instance footprint areas over a split; ``single_scan`` rasterizes each
    scan alone (no completion) like reference compute_area_no_completion."""
    from mask_bev_tpu.datasets.semantic_kitti.dataset import (
        SemanticKittiSequenceDataset)
    from mask_bev_tpu.datasets.semantic_kitti.mask_data import (
        SemanticKittiMaskDataset)
    from mask_bev_tpu.datasets.semantic_kitti.rasterizer import (
        SemanticKittiRasterizer)
    from mask_bev_tpu.datasets.semantic_kitti.scene import SceneMaker
    from mask_bev_tpu.datasets.semantic_kitti.taxonomy import RawLabel
    import numpy as np

    seq_ds = SemanticKittiSequenceDataset(
        root, split, included_labels=[RawLabel.CAR])
    areas = []
    if single_scan:
        r = SemanticKittiRasterizer((-40, 40), (-40, 40), (-10, 10), 0.16,
                                    remove_unseen=True, min_points=1)
        for i in range(len(seq_ds.dataset)):
            scan = seq_ds.dataset[i]
            maker = SceneMaker()
            maker.add_scan(scan)
            mask = r.get_mask_around(scan, maker.scene)
            for inst in np.unique(mask)[np.unique(mask) != 0]:
                areas.append(int((mask == inst).sum()))
    else:
        md = SemanticKittiMaskDataset(
            seq_ds, (-40, 40), (-40, 40), (-10, 10), 0.16,
            remove_unseen=True, min_points=1)
        for i in range(len(md)):
            mask = md[i].mask
            import numpy as np

            for inst in np.unique(mask)[np.unique(mask) != 0]:
                areas.append(int((mask == inst).sum()))
    return areas


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pred-areas", help="MaskArea pickle ({inst: {tgt, pred}})")
    p.add_argument("--root", default="data/SemanticKITTI")
    p.add_argument("--compute-gt", choices=["completion", "no_completion"])
    p.add_argument("--out", default="area_stats.png")
    args = p.parse_args()

    if args.compute_gt:
        areas = compute_gt_areas(
            args.root, single_scan=(args.compute_gt == "no_completion"))
        out = f"mask_area_{args.compute_gt}.pkl"
        with open(out, "wb") as f:
            pickle.dump(areas, f)
        print(f"wrote {len(areas)} instance areas to {out}")
        return

    if args.pred_areas:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as np

        with open(args.pred_areas, "rb") as f:
            area_pred: Dict = pickle.load(f)
        ratios = [m["pred"] / m["tgt"] for m in area_pred.values()
                  if m["tgt"] > 0]
        mu = float(np.mean(ratios)) if ratios else float("nan")
        fig, ax = plt.subplots(figsize=(7, 6))
        ax.hist(ratios, bins=25, color="#dc3f76")
        ax.axvline(mu, color="#001482")
        ax.set_xlabel(r"$A_{pred} / A_{complete}$")
        ax.set_ylabel("# Instances")
        ax.set_xlim(0, 3)
        ax.set_title(f"mean ratio = {mu:.2f}")
        fig.savefig(args.out, dpi=200, bbox_inches="tight")
        print(f"mean A_pred/A_complete = {mu:.3f}; wrote {args.out}")


if __name__ == "__main__":
    main()
