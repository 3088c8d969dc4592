"""High-level inference API: checkpoint -> masks/classes/boxes for raw scans.

Covers the reference's figure/inference flow
(``mask_bev_figures/test_figures.py:24-115``: from_config + forward_encode /
forward_backbone / pred_masks, then per-query argmax>0 thresholding) as a
library API instead of unittest scripts.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mask_bev_tpu.config import MaskBevConfig
from mask_bev_tpu.evaluation.kitti_eval import mask_to_boxes
from mask_bev_tpu.models.maskbev import MaskBev
from mask_bev_tpu.ops.voxelize import pad_points


@dataclasses.dataclass
class ScanPredictions:
    """Per-scan decoded predictions."""

    scores: np.ndarray  # (n,) kept-query score
    labels: np.ndarray  # (n,) class index (unflipped convention)
    masks: np.ndarray  # (n, H/4, W/4) bool
    mask_probs: np.ndarray  # (n, H/4, W/4) float
    boxes: np.ndarray  # (n, 5) BEV rotated boxes in meters (x, y, w, l, yaw)


class MaskBevPredictor:
    """Jitted batched inference over padded raw scans."""

    def __init__(self, cfg: MaskBevConfig, variables,
                 background_class: int = 0):
        from mask_bev_tpu.utils.precision import (
            apply_compute_dtype, resolve_dtype)

        self.cfg = cfg
        self.model = MaskBev(cfg)
        # cfg.compute_dtype: bfloat16 puts the whole forward pass in bf16
        self.variables = apply_compute_dtype(variables, cfg)
        self.background_class = background_class
        in_dtype = resolve_dtype(cfg.compute_dtype)

        # params as explicit args (closure arrays become HLO constants,
        # which blocks device-resident reuse on remote-attached TPUs)
        @jax.jit
        def _fwd(v, points, mask):
            # final_only: intermediate decoder layers skip their full-res
            # mask logits (exact factoring through the bilinear resize)
            out = self.model.apply(v, points.astype(in_dtype), mask,
                                   train=False, final_only=True)
            return (jax.nn.softmax(
                        out.cls_logits[-1].astype(jnp.float32), axis=-1),
                    jax.nn.sigmoid(
                        out.mask_logits[-1].astype(jnp.float32)))

        self._fwd = lambda points, mask: _fwd(self.variables, points, mask)

    @classmethod
    def from_checkpoint(cls, cfg: MaskBevConfig, ckpt_dir: str,
                        which: str = "best") -> "MaskBevPredictor":
        from mask_bev_tpu.train.checkpoint import CheckpointManager
        from mask_bev_tpu.train.step import create_train_state

        model, state = create_train_state(cfg, jax.random.PRNGKey(0))
        mgr = CheckpointManager(ckpt_dir)
        restored = mgr.restore(
            {"params": state.params, "batch_stats": state.batch_stats}, which)
        if restored is None:
            raise FileNotFoundError(f"no '{which}' checkpoint in {ckpt_dir}")
        return cls(cfg, {"params": restored["params"],
                         "batch_stats": restored["batch_stats"]})

    def predict_batch(self, points: np.ndarray, point_mask: np.ndarray,
                      score_threshold: float = 0.5) -> List[ScanPredictions]:
        cls_probs, mask_probs = self._fwd(
            jnp.asarray(points), jnp.asarray(point_mask))
        cls_probs = np.asarray(cls_probs)
        mask_probs = np.asarray(mask_probs)
        out = []
        for b in range(cls_probs.shape[0]):
            pred_cls = cls_probs[b].argmax(-1)
            # reference decode: keep queries whose argmax class != 0
            keep = np.flatnonzero(pred_cls != self.background_class)
            scores = cls_probs[b][keep, pred_cls[keep]]
            keep = keep[scores >= score_threshold]
            scores = cls_probs[b][keep, pred_cls[keep]]
            boxes, bscores, blabels = mask_to_boxes(
                cls_probs[b], mask_probs[b], self.cfg,
                score_threshold=score_threshold)
            out.append(ScanPredictions(
                scores=scores,
                labels=pred_cls[keep],
                masks=mask_probs[b][keep] > 0.5,
                mask_probs=mask_probs[b][keep],
                boxes=boxes))
        return out

    def predict_scan(self, points: np.ndarray,
                     score_threshold: float = 0.5) -> ScanPredictions:
        padded, mask = pad_points(
            points, self.cfg.max_points_per_scan, self.cfg.pc_point_dim)
        return self.predict_batch(
            padded[None], mask[None], score_threshold)[0]
