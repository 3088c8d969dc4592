"""Per-decoder-layer online metrics (reference semantics, TPU-friendly).

Rebuild of ``MaskBevPanopticHead.update_mAP_metrics`` (reference
``mask_bev_panoptic_head.py:34-96``) + the per-layer metric dicts of the task
module (``mask_bev_module.py:82-94,223-240``): for EVERY decoder layer, on
train and val, re-derive the query->GT assignment and update
  * binary classification AP (reference: scores of ``evaluated_class`` —
    class index 0, the de-facto no-object class in the unflipped label
    convention; see the y_true note below),
  * mean IoU of thresholded matched masks vs GT,
  * COCO-style segm mAP (map / map_50 / map_75 like torchmetrics).

TPU-first: matching, mask upscale (``jax.image.resize`` = the reference's
bilinear F.interpolate), thresholding and the full pred x gt IoU matrices are
computed ON DEVICE by one jitted function reused across layers; the host
receives only small per-query vectors, appended lazily so the training step
stream never synchronizes mid-epoch.

y_true convention (documented deviation): the reference feeds the RAW matched
label vector into a torchmetrics *binary* AP whose semantics for labels
outside {0, 1} are undefined (``mask_bev_panoptic_head.py:74-80``). Here the
binary target is the well-defined completion ``labels == evaluated_class``,
i.e. the AP of predicting the evaluated class; parity comparisons should use
the mask metrics, which are unambiguous.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mask_bev_tpu.config import MaskBevConfig
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
        out = {"cls_mAP": self.cls_ap.compute(), "mIoU": self.miou.compute()}
        out.update({f"mask_{k}": v for k, v in
                    self.segm_map.compute_dict().items()})
        return out


def make_layer_stats_fn(cfg: MaskBevConfig, evaluated_class: int = 0):
    """Jitted per-layer device computation shared by all decoder layers."""

    @jax.jit
    def layer_stats(rng, cls_logits, mask_logits, gt_labels, gt_masks,
                    gt_valid):
        b, q = cls_logits.shape[:2]
        h, w = gt_masks.shape[-2:]
        mr = match_layer(rng, cls_logits, mask_logits, gt_labels,
                         gt_masks, gt_valid, cfg)
        probs = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)
        pred = jax.nn.sigmoid(jax.image.resize(
            mask_logits.astype(jnp.float32), (b, q, h, w), "bilinear")) > 0.5
        gm = gt_masks.astype(jnp.float32)
        pm = pred.astype(jnp.float32)
        inter = jnp.einsum("bqhw,bghw->bqg", pm, gm)
        area_p = pm.sum((-2, -1))
        area_g = gm.sum((-2, -1))
        ious = inter / (area_p[:, :, None] + area_g[:, None, :] - inter + 1e-7)
        # IoU of each matched (query, gt) pair
        iou_matched = jnp.take_along_axis(
            ious, mr.gt_of_query[..., None], axis=-1)[..., 0]
        return probs, mr.matched, mr.gt_of_query, ious, iou_matched

    return layer_stats


class LayerMetricsBank:
    """One LayerMetrics per decoder output, with lazy device->host flushing."""

    def __init__(self, cfg: MaskBevConfig, evaluated_class: int = 0,
                 max_pending_batches: int = 8):
        self.cfg = cfg
        self.evaluated_class = evaluated_class
        self.num_layers = cfg.num_decoder_outputs
        self.layers = {i: LayerMetrics.create() for i in range(self.num_layers)}
        self._stats_fn = make_layer_stats_fn(cfg, evaluated_class)
        self._pending: List = []
        # bound device memory: each pending entry pins (B,Q,G) IoU matrices
        # etc. in HBM; holding a whole epoch's worth risks OOM on long
        # epochs, so flush to host every few batches (sync cost amortizes)
        self._max_pending = max_pending_batches * self.num_layers

    def reset(self):
        for m in self.layers.values():
            m.reset()
        self._pending.clear()

    def update(self, rng: jax.Array, outputs: DecoderOutputs,
               batch: Dict[str, np.ndarray]) -> None:
        """Enqueue device-side stats for every layer; no host sync here."""
        gt_labels = jnp.asarray(batch["gt_labels"])
        gt_masks = jnp.asarray(batch["gt_masks"])
        gt_valid = jnp.asarray(batch["gt_valid"])
        # GT rows entering segm mAP: valid and non-degenerate (old behavior)
        gt_real = np.asarray(batch["gt_valid"]) & (
            np.asarray(batch["gt_masks"]).sum((-2, -1)) > 0)
        for i in range(self.num_layers):
            rng, sub = jax.random.split(rng)
            stats = self._stats_fn(
                sub, outputs.cls_logits[i], outputs.mask_logits[i],
                gt_labels, gt_masks, gt_valid)
            self._pending.append((i, stats, batch["gt_labels"], gt_real))
        if len(self._pending) >= self._max_pending:
            self._flush()

    def _flush(self) -> None:
        for i, stats, gt_labels_np, gt_real_np in self._pending:
            probs, matched, gt_of_query, ious, iou_matched = (
                np.asarray(s) for s in stats)
            m = self.layers[i]
            b = probs.shape[0]
            nc = self.cfg.head_num_classes
            # cls-AP and mIoU pool globally over queries — update them with
            # one whole-batch call each instead of b python iterations
            labels = np.where(
                matched, np.take_along_axis(gt_labels_np, gt_of_query, 1), nc)
            m.cls_ap.update(
                probs[..., self.evaluated_class].ravel(),
                (labels == self.evaluated_class).astype(np.int64).ravel())
            if matched.any():
                m.miou.update(iou_matched[matched])

            # COCO segm mAP matches per image: keep the per-sample loop but
            # with all selectors precomputed batch-wide
            pred_cls = probs.argmax(-1)
            pred_score = probs.max(-1)
            keep = pred_cls != self.evaluated_class
            for s in range(b):
                ks, gs = keep[s], gt_real_np[s]
                m.segm_map.update_from_ious(
                    pred_scores=pred_score[s][ks],
                    pred_labels=pred_cls[s][ks],
                    gt_labels=gt_labels_np[s][gs],
                    ious=ious[s][ks][:, gs])
        self._pending.clear()

    def compute(self) -> Dict[str, float]:
        """Reference metric names: mAP_cls_{i}, mAP_{i}_{map*}, mIoU_{i}
        (``mask_bev_module.py:223-240``)."""
        self._flush()
        out: Dict[str, float] = {}
        for i, m in self.layers.items():
            vals = m.compute()
            out[f"mAP_cls_{i}"] = vals["cls_mAP"]
            out[f"mIoU_{i}"] = vals["mIoU"]
            for k, v in vals.items():
                if k.startswith("mask_"):
                    out[f"mAP_{i}_{k[5:]}"] = v
        return out


# --- backwards-compatible single-layer helpers (final layer only) ---

def update_layer_metrics(
    rng: jax.Array,
    outputs: DecoderOutputs,
    batch: Dict[str, np.ndarray],
    metrics: LayerMetrics,
    cfg: MaskBevConfig,
    layer_index: int = -1,
    evaluated_class: int = 0,
) -> None:
    """Update one LayerMetrics for a single decoder layer (tests/tools)."""
    bank = LayerMetricsBank(cfg, evaluated_class)
    idx = layer_index % cfg.num_decoder_outputs
    bank.layers[idx] = metrics
    stats = bank._stats_fn(
        rng, outputs.cls_logits[idx], outputs.mask_logits[idx],
        jnp.asarray(batch["gt_labels"]), jnp.asarray(batch["gt_masks"]),
        jnp.asarray(batch["gt_valid"]))
    gt_real = np.asarray(batch["gt_valid"]) & (
        np.asarray(batch["gt_masks"]).sum((-2, -1)) > 0)
    bank._pending.append((idx, stats, batch["gt_labels"], gt_real))
    bank._flush()
