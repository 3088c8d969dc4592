"""Online metric accumulators (host-side numpy).

Rebuild of reference ``evaluation/detection_metric.py:10-111`` without
torchmetrics: same update/compute/reset API, plain numpy state. Cross-host
reduction (the reference's ``dist_reduce_fx``) is a ``gather_states`` hook:
states are plain arrays, so multi-host training can allgather and merge.

Includes a COCO-style segmentation mAP (``MaskMeanAveragePrecision``)
standing in for torchmetrics ``MeanAveragePrecision(iou_type='segm')`` used
per decoder layer by the reference (``mask_bev_module.py:85-94``): greedy
score-ordered matching per image at IoU thresholds 0.50:0.95:0.05, 101-point
interpolated AP, averaged over thresholds and classes.
"""
from __future__ import annotations

import pickle
from typing import Dict, List, Optional

import numpy as np

from mask_bev_tpu.evaluation.average_precision import (
    IntegrationMode, average_precision, batched_mask_iou)

_EPS = 1e-12


class _ListMetric:
    def __init__(self):
        self.reset()

    def reset(self):
        for k in self._state_names():
            setattr(self, k, [])

    def _state_names(self):
        raise NotImplementedError


def _thresholded_binary_ap(scores: np.ndarray, targets: np.ndarray,
                           num_thresholds: int = 11) -> float:
    """torchmetrics binary_average_precision(thresholds=N) semantics."""
    t = np.linspace(0, 1, num_thresholds)
    preds = scores[None, :] >= t[:, None]  # (T, N)
    tp = (preds & (targets[None] == 1)).sum(1).astype(np.float64)
    fp = (preds & (targets[None] == 0)).sum(1).astype(np.float64)
    fn = ((~preds) & (targets[None] == 1)).sum(1).astype(np.float64)
    precision = np.where(tp + fp > 0, tp / np.maximum(tp + fp, 1), 1.0)
    recall = np.where(tp + fn > 0, tp / np.maximum(tp + fn, 1), 0.0)
    precision = np.concatenate([precision, [1.0]])
    recall = np.concatenate([recall, [0.0]])
    return float(-np.sum(np.diff(recall) * precision[:-1]))


class BinaryClassifMapMetric(_ListMetric):
    """11-threshold binary AP over accumulated scores (ref :10-31)."""

    def _state_names(self):
        return ["y_score", "y_true"]

    def update(self, y_score, y_true):
        self.y_score.append(np.asarray(y_score).reshape(-1))
        self.y_true.append(np.asarray(y_true).reshape(-1))

    def compute(self) -> float:
        if not self.y_score:
            return 0.0
        return _thresholded_binary_ap(
            np.concatenate(self.y_score),
            np.concatenate(self.y_true).astype(np.int64))


class ClassifMapMetric(_ListMetric):
    """Macro multiclass AP at 11 thresholds (ref :34-52)."""

    def __init__(self, num_classes: int = 12):
        self.num_classes = num_classes
        super().__init__()

    def _state_names(self):
        return ["y_score", "y_true"]

    def update(self, y_score, y_true):
        self.y_score.append(np.asarray(y_score).reshape(-1, self.num_classes))
        self.y_true.append(np.asarray(y_true).reshape(-1))

    def compute(self) -> float:
        if not self.y_score:
            return 0.0
        scores = np.concatenate(self.y_score)
        true = np.concatenate(self.y_true).astype(np.int64)
        aps = [
            _thresholded_binary_ap(scores[:, c], (true == c).astype(np.int64))
            for c in range(self.num_classes)
        ]
        return float(np.mean(aps))


class DetectionMapMetric(_ListMetric):
    """Custom AP over accumulated TP flags (ref :54-74)."""

    def __init__(self, integration_mode=IntegrationMode.InterpolationPASCAL):
        self.integration_mode = integration_mode
        super().__init__()

    def _state_names(self):
        return ["confidences", "is_true_positive", "_total_gt"]

    def reset(self):
        super().reset()
        self.total_gt = 0

    def update(self, confidences, is_true_positive, total_gt: int):
        self.confidences.append(np.asarray(confidences).reshape(-1))
        self.is_true_positive.append(np.asarray(is_true_positive).reshape(-1))
        self.total_gt += int(total_gt)

    def compute(self) -> float:
        if not self.confidences:
            return 0.0
        return average_precision(
            np.concatenate(self.confidences),
            np.concatenate(self.is_true_positive),
            self.total_gt, self.integration_mode)


class MeanIoU(_ListMetric):
    def _state_names(self):
        return ["ious"]

    def update(self, ious):
        self.ious.append(np.asarray(ious).reshape(-1))

    def compute(self) -> float:
        if not self.ious:
            return 0.0
        cat = np.concatenate(self.ious)
        return float(cat.mean()) if cat.size else 0.0


class MaskArea(_ListMetric):
    """Footprint-completion area bookkeeping (ref :95-111). The reference
    dumps to a hardcoded pickle path in compute(); here the path is an
    argument (documented deviation)."""

    def _state_names(self):
        return ["_dummy"]

    def reset(self):
        self.areas: Dict = {}

    def update(self, target_masks, pred_masks, inst):
        tgt = int((np.asarray(target_masks) > 0).sum())
        pred = int((np.asarray(pred_masks) > 0).sum())
        entry = self.areas.setdefault(inst, {"tgt": 0, "pred": 0})
        entry["tgt"] = max(tgt, entry["tgt"])
        entry["pred"] = max(pred, entry["pred"])

    def compute(self, dump_path: Optional[str] = None):
        if dump_path:
            with open(dump_path, "wb") as f:
                pickle.dump(dict(self.areas), f)
        return dict(self.areas)


class MaskMeanAveragePrecision:
    """COCO-style segm mAP over accumulated (pred, target) image pairs."""

    IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)

    def __init__(self):
        self.reset()

    def reset(self):
        self._images: List[dict] = []

    def update(self, pred_masks, pred_scores, pred_labels,
               gt_masks, gt_labels):
        """One image: pred_masks (P, H, W) bool, scores (P,), labels (P,);
        gt_masks (G, H, W) bool, gt_labels (G,)."""
        self._images.append(dict(
            pm=np.asarray(pred_masks, bool),
            ps=np.asarray(pred_scores, np.float64).reshape(-1),
            pl=np.asarray(pred_labels, np.int64).reshape(-1),
            gm=np.asarray(gt_masks, bool),
            gl=np.asarray(gt_labels, np.int64).reshape(-1),
        ))

    def compute(self) -> float:
        if not self._images:
            return 0.0
        classes = sorted(set(np.concatenate(
            [img["gl"] for img in self._images] or [np.array([], np.int64)]
        ).tolist()))
        if not classes:
            return 0.0
        aps = []
        for cls in classes:
            # gather detections for this class across images
            scores, matches_by_t, total_gt = [], [], 0
            per_image = []
            for img in self._images:
                pi = img["pl"] == cls
                gi = img["gl"] == cls
                pm, ps = img["pm"][pi], img["ps"][pi]
                gm = img["gm"][gi]
                total_gt += gm.shape[0]
                if pm.shape[0] == 0:
                    continue
                ious = np.zeros((pm.shape[0], gm.shape[0]))
                for a in range(pm.shape[0]):
                    for b in range(gm.shape[0]):
                        inter = np.logical_and(pm[a], gm[b]).sum()
                        union = np.logical_or(pm[a], gm[b]).sum()
                        ious[a, b] = inter / (union + _EPS)
                per_image.append((ps, ious))
            if total_gt == 0:
                continue
            for t in self.IOU_THRESHOLDS:
                confs, tps = [], []
                for ps, ious in per_image:
                    order = np.argsort(-ps, kind="stable")
                    taken = np.zeros(ious.shape[1], bool)
                    for d in order:
                        confs.append(ps[d])
                        best, best_iou = -1, t
                        for g in range(ious.shape[1]):
                            if not taken[g] and ious[d, g] >= best_iou:
                                best, best_iou = g, ious[d, g]
                        if best >= 0:
                            taken[best] = True
                            tps.append(1.0)
                        else:
                            tps.append(0.0)
                aps.append(average_precision(
                    np.asarray(confs), np.asarray(tps), total_gt,
                    IntegrationMode.InterpolationCOCO))
        return float(np.mean(aps)) if aps else 0.0
