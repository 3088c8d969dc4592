"""LayerMetricsBank: vectorized flush vs an independent per-sample oracle.

The bank batches its host-side flush (one cls-AP/mIoU update per pending
entry instead of per sample); this pins the result to a slow per-sample
re-derivation of the same statistics (reference semantics:
``mask_bev_panoptic_head.py:34-96``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mask_bev_tpu.config import tiny_test_config
from mask_bev_tpu.evaluation.detection_metric import (
    BinaryClassifMapMetric, MaskMeanAveragePrecision, MeanIoU)
from mask_bev_tpu.models.mask2former import DecoderOutputs
from mask_bev_tpu.train.metrics import LayerMetricsBank, make_layer_stats_fn


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config()


def _random_batch(rng, cfg, b):
    h, w = cfg.grid_hw
    q = cfg.num_queries
    gt_masks = rng.random((b, q, h, w)) > 0.7
    gt_valid = np.zeros((b, q), bool)
    for i in range(b):
        gt_valid[i, : rng.integers(1, q)] = True
    return {
        "gt_labels": rng.integers(
            0, cfg.head_num_classes, (b, q)).astype(np.int32),
        "gt_masks": (gt_masks & gt_valid[..., None, None]),
        "gt_valid": gt_valid,
    }


def _random_outputs(rng, cfg, b, n_layers):
    h, w = cfg.grid_hw
    q = cfg.num_queries
    hh, wh = h // 4, w // 4
    cls = [jnp.asarray(rng.normal(size=(b, q, cfg.head_num_classes + 1))
                       .astype(np.float32)) for _ in range(n_layers)]
    msk = [jnp.asarray(rng.normal(size=(b, q, hh, wh)).astype(np.float32))
           for _ in range(n_layers)]
    return DecoderOutputs(cls_logits=cls, mask_logits=msk,
                          height_logits=None)


def test_flush_matches_per_sample_oracle(cfg):
    rng = np.random.default_rng(0)
    b, n_layers = 3, cfg.num_decoder_outputs
    bank = LayerMetricsBank(cfg, max_pending_batches=1)  # force flushes
    stats_fn = make_layer_stats_fn(cfg)

    oracle = {i: (BinaryClassifMapMetric(), MaskMeanAveragePrecision(),
                  MeanIoU()) for i in range(n_layers)}

    key = jax.random.PRNGKey(0)
    for step in range(2):
        batch = _random_batch(rng, cfg, b)
        outputs = _random_outputs(rng, cfg, b, n_layers)
        key, sub = jax.random.split(key)
        bank.update(sub, outputs, batch)

        # oracle: identical stats, per-sample updates (the old flush shape)
        gt_real = batch["gt_valid"] & (batch["gt_masks"].sum((-2, -1)) > 0)
        krng = sub
        for i in range(n_layers):
            krng, s2 = jax.random.split(krng)
            probs, matched, gt_of_query, ious, iou_matched = (
                np.asarray(x) for x in stats_fn(
                    s2, outputs.cls_logits[i], outputs.mask_logits[i],
                    jnp.asarray(batch["gt_labels"]),
                    jnp.asarray(batch["gt_masks"]),
                    jnp.asarray(batch["gt_valid"])))
            cls_ap, segm, miou = oracle[i]
            q = probs.shape[1]
            nc = cfg.head_num_classes
            for s in range(b):
                mk = matched[s]
                labels = np.full(q, nc, np.int64)
                labels[mk] = batch["gt_labels"][s][gt_of_query[s][mk]]
                cls_ap.update(probs[s, :, 0], (labels == 0).astype(np.int64))
                if mk.any():
                    miou.update(iou_matched[s][mk])
                pred_cls = probs[s].argmax(-1)
                keep = pred_cls != 0
                segm.update_from_ious(
                    pred_scores=probs[s].max(-1)[keep],
                    pred_labels=pred_cls[keep],
                    gt_labels=batch["gt_labels"][s][gt_real[s]],
                    ious=ious[s][keep][:, gt_real[s]])

    got = bank.compute()
    for i in range(n_layers):
        cls_ap, segm, miou = oracle[i]
        assert got[f"mAP_cls_{i}"] == pytest.approx(cls_ap.compute())
        assert got[f"mIoU_{i}"] == pytest.approx(miou.compute())
        assert got[f"mAP_{i}_map"] == pytest.approx(
            segm.compute_dict()["map"])
