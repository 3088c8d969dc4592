"""Per-decoder-layer online metrics (reference semantics).

Rebuild of ``MaskBevPanopticHead.update_mAP_metrics`` (reference
``mask_bev_panoptic_head.py:34-96``) + the per-layer metric dicts of the task
module (``mask_bev_module.py:82-94``): for a chosen decoder layer, re-derive
the query->GT assignment, then update
  * binary classification AP (scores of ``evaluated_class`` vs matched
    labels — the reference evaluates class index 0),
  * mean IoU of thresholded matched masks vs GT,
  * COCO-style segm mAP.

Matching reuses the on-device Hungarian; mask upscale to GT resolution via
``jax.image.resize`` mirrors the reference's F.interpolate bilinear.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mask_bev_tpu.config import MaskBevConfig
from mask_bev_tpu.evaluation.average_precision import batched_mask_iou
from mask_bev_tpu.evaluation.detection_metric import (
    BinaryClassifMapMetric, MaskMeanAveragePrecision, MeanIoU)
from mask_bev_tpu.losses import match_layer
from mask_bev_tpu.models.mask2former import DecoderOutputs


@dataclasses.dataclass
class LayerMetrics:
    cls_ap: BinaryClassifMapMetric
    segm_map: MaskMeanAveragePrecision
    miou: MeanIoU

    @classmethod
    def create(cls) -> "LayerMetrics":
        return cls(BinaryClassifMapMetric(), MaskMeanAveragePrecision(), MeanIoU())

    def reset(self):
        self.cls_ap.reset()
        self.segm_map.reset()
        self.miou.reset()

    def compute(self) -> Dict[str, float]:
        return {
            "cls_mAP": self.cls_ap.compute(),
            "mask_mAP": self.segm_map.compute(),
            "mIoU": self.miou.compute(),
        }


def update_layer_metrics(
    rng: jax.Array,
    outputs: DecoderOutputs,
    batch: Dict[str, np.ndarray],
    metrics: LayerMetrics,
    cfg: MaskBevConfig,
    layer_index: int = -1,
    evaluated_class: int = 0,
) -> None:
    cls_logits = outputs.cls_logits[layer_index]
    mask_logits = outputs.mask_logits[layer_index]
    gt_labels = jnp.asarray(batch["gt_labels"])
    gt_masks = jnp.asarray(batch["gt_masks"])
    gt_valid = jnp.asarray(batch["gt_valid"])

    mr = match_layer(rng, cls_logits, mask_logits, gt_labels,
                     gt_masks, gt_valid, cfg)

    b, q = cls_logits.shape[:2]
    h, w = gt_masks.shape[-2:]
    probs = np.asarray(jax.nn.softmax(cls_logits, axis=-1))
    pred_masks = np.asarray(jax.nn.sigmoid(jax.image.resize(
        mask_logits, (b, q, h, w), "bilinear"))) > 0.5
    gt_of_query = np.asarray(mr.gt_of_query)
    matched = np.asarray(mr.matched)
    gt_labels_np = np.asarray(gt_labels)
    gt_masks_np = np.asarray(gt_masks).astype(bool)
    gt_valid_np = np.asarray(gt_valid)

    for s in range(b):
        # classification metric: score of evaluated_class vs matched label
        y_scores = probs[s, :, evaluated_class]
        labels = np.full(q, cfg.head_num_classes, np.int64)
        m = matched[s]
        labels[m] = gt_labels_np[s][gt_of_query[s][m]]
        y_true = (labels == evaluated_class).astype(np.int64)
        metrics.cls_ap.update(y_scores, y_true)

        # mIoU over matched (pred, gt) pairs
        if m.any():
            tgt = gt_masks_np[s][gt_of_query[s][m]]
            prd = pred_masks[s][m]
            metrics.miou.update(batched_mask_iou(tgt, prd))

        # segm mAP: predictions = non-background argmax queries
        pred_cls = probs[s].argmax(-1)
        keep = pred_cls != evaluated_class  # background slot
        gv = gt_valid_np[s] & (np.arange(q) < q)
        real_gt = gv & (gt_masks_np[s].sum((-2, -1)) > 0)
        metrics.segm_map.update(
            pred_masks=pred_masks[s][keep],
            pred_scores=probs[s].max(-1)[keep],
            pred_labels=pred_cls[keep],
            gt_masks=gt_masks_np[s][real_gt],
            gt_labels=gt_labels_np[s][real_gt])
