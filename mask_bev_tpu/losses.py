"""Hungarian matching + deep-supervised losses, fully batched on-device.

Rebuilds the reference loss path (``mask2former_head.py:246-426`` +
assigner config at ``mask_bev_panoptic_head.py:197-213``) with TPU-native
semantics: no per-image python loops, no host sync — matching and losses are
vmapped over (layer, image) with padded GT and validity masks.

Pieces and their reference anchors:
  * matching cost = 2.0 * ClassificationCost + 5.0 * CrossEntropyLossCost
    (binary, on 12544 uniformly sampled mask points) + 5.0 * DiceCost
    (naive dice, eps=1.0)  — ``mask_bev_panoptic_head.py:200-213``;
  * classification: softmax CE over Q queries, background class appended at
    index ``num_classes`` with class weight 0.1 (optionally reversed:
    ``head_reverse_class_weights``, ref :101-103), normalized by
    sum of per-label class weights — ``mask2former_head.py:360-373``;
  * mask loss: sigmoid BCE on PointRend uncertainty-sampled points,
    avg_factor = num_total_masks * num_points — ref :401-424;
  * dice loss: naive dice (eps=1.0) on the same sampled points,
    avg_factor = num_total_masks — ref :401-424;
  * optional height: 12-way CE on matched queries, labels binned as
    ``round((h - 1) / 0.2) + 1`` clipped to [0, 11] — ref :380-382,451;
  * deep supervision: all L+1 head passes summed — ref :283-298 and
    ``mask_bev_module.py:193-195``;
  * ``num_total_masks`` is computed on the GLOBAL (sharded) batch under
    pjit, which reproduces the reference's cross-rank ``reduce_mean``
    normalizer (ref :388) without explicit collectives.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mask_bev_tpu.config import MaskBevConfig
from mask_bev_tpu.models.mask2former import DecoderOutputs
from mask_bev_tpu.ops.hungarian import match
from mask_bev_tpu.ops.point_sample import (
    point_sample, point_sample_dense, point_sample_dense_per,
    uncertain_point_coords)


def _largest_divisor_leq(n: int, target: int) -> int:
    for d in range(max(1, min(n, target)), 0, -1):
        if n % d == 0:
            return d
    return 1


# per-intermediate element budget for chunked dense sampling (f32 elems);
# bounds the (chunk, P, H) hat/product tensors to ~192 MB each
_CHUNK_BUDGET = 48 * 1024 * 1024


def _sample_cfg(cfg: MaskBevConfig):
    dense = cfg.loss_sample_dense
    dtype = cfg.loss_sample_dtype
    if dtype == "auto":  # follow the model's compute dtype
        dtype = cfg.compute_dtype
    mm_dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    return dense, mm_dtype


def _sample_shared(imgs, pts, cfg):
    """(N, H, W) at shared (P, 2) -> (N, P), dense on request."""
    dense, mm_dtype = _sample_cfg(cfg)
    if not dense:
        return point_sample(imgs, pts)
    n, h, _ = imgs.shape
    chunk = _largest_divisor_leq(
        pts.shape[0], max(1, _CHUNK_BUDGET // (max(n, 1) * h)))
    return point_sample_dense(imgs, pts, mm_dtype=mm_dtype, chunk=chunk)


def _sample_per(imgs, pts, cfg):
    """(N, H, W) at per-image (N, P, 2) -> (N, P), dense on request."""
    dense, mm_dtype = _sample_cfg(cfg)
    if not dense:
        return jax.vmap(point_sample)(imgs, pts)
    n, h, _ = imgs.shape
    chunk = _largest_divisor_leq(
        n, max(1, _CHUNK_BUDGET // (pts.shape[1] * h)))
    return point_sample_dense_per(imgs, pts, mm_dtype=mm_dtype, chunk=chunk)


class MatchResult(NamedTuple):
    gt_of_query: jax.Array  # (..., Q) int32, -1 = unmatched
    matched: jax.Array  # (..., Q) bool


def _gt_crop_size(cfg: MaskBevConfig, gt_hw) -> int:
    """Active GT-crop size, or 0 when disabled / grid too small to matter."""
    s = cfg.loss_gt_crop
    if s and s < min(int(gt_hw[0]), int(gt_hw[1])):
        return int(s)
    return 0


def gt_crops(gt_masks: jax.Array, crop: int):
    """Per-instance square crops of binary GT masks, centered on the bbox.

    Sampling a GT mask through its crop is EXACT whenever the instance's
    bbox fits inside the crop: the mask is zero outside its bbox, so any
    hat-weight mass falling off the crop lands on zeros in the full-grid
    sample too. GT masks are fixed across the L+1 deeply-supervised head
    passes, so crops are computed once per step.

    An instance whose bbox EXCEEDS the crop is silently truncated (its
    out-of-crop mass samples as zeros), corrupting its matching costs and
    mask/dice targets — callers must size the crop from the physical extent
    of the largest expected footprint (see ``MaskBevConfig.loss_gt_crop``).
    The per-instance ``truncated`` flag returned here feeds the
    ``gt_crop_truncated`` train-log counter so misconfiguration is visible.

    Args:
      gt_masks: (B, G, H, W) binary (bool or {0,1} float).
      crop: S, the static crop size (must be <= min(H, W)).
    Returns:
      crops: (B, G, S, S) float32; origins: (B, G, 2) int32 (oy, ox);
      truncated: (B, G) bool, True where the instance bbox exceeds the crop.
    """
    b, g, h, w = gt_masks.shape
    on = gt_masks > 0
    rows = on.any(-1)  # (B, G, H)
    cols = on.any(-2)  # (B, G, W)

    def span(v, n):
        first = jnp.argmax(v, -1)
        last = n - 1 - jnp.argmax(v[..., ::-1], -1)
        return first, last

    y0, y1 = span(rows, h)
    x0, x1 = span(cols, w)
    oy = jnp.clip((y0 + y1 + 1 - crop) // 2, 0, h - crop).astype(jnp.int32)
    ox = jnp.clip((x0 + x1 + 1 - crop) // 2, 0, w - crop).astype(jnp.int32)

    def slice_one(img, sy, sx):
        return jax.lax.dynamic_slice(
            img.astype(jnp.float32), (sy, sx), (crop, crop))

    crops = jax.vmap(jax.vmap(slice_one))(gt_masks, oy, ox)
    truncated = ((y1 - y0 + 1 > crop) | (x1 - x0 + 1 > crop)) & on.any((-2, -1))
    return crops, jnp.stack([oy, ox], axis=-1), truncated


def _crop_local_coords(pts, origins, gt_hw, s: int):
    """Normalized full-grid coords -> crop-local normalized coords.

    ``sample(full, p) == sample(crop, local(p))`` for bilinear sampling with
    zero padding, given the mask is zero outside the crop: the continuous
    sample position ``x*W - 0.5`` shifts by the crop origin and rescales.

    Args:
      pts: (..., P, 2) (x, y) in [0, 1] over the full (H, W) grid.
      origins: (..., 2) int (oy, ox); broadcasts against ``pts``'s batch dims.
    Returns:
      (..., P, 2) coords for sampling the (S, S) crops.
    """
    h, w = gt_hw
    scale = jnp.asarray([w, h], pts.dtype)
    off = origins[..., None, ::-1].astype(pts.dtype)  # (..., 1, 2) = (ox, oy)
    return (pts * scale - off) / s


def _binary_ce_cost(pred_logits_pts, gt_pts):
    """Pairwise mean binary CE: (Q, P) logits x (G, P) targets -> (Q, G)."""
    p = pred_logits_pts.shape[-1]
    pos = jax.nn.softplus(-pred_logits_pts)  # cost if target=1
    neg = jax.nn.softplus(pred_logits_pts)  # cost if target=0
    cost = (
        jnp.einsum("qp,gp->qg", pos, gt_pts, preferred_element_type=jnp.float32)
        + jnp.einsum("qp,gp->qg", neg, 1.0 - gt_pts,
                     preferred_element_type=jnp.float32)
    )
    return cost / p


def _dice_cost(pred_logits_pts, gt_pts, eps: float = 1.0):
    """Pairwise naive-dice cost: (Q, P) x (G, P) -> (Q, G)."""
    pr = jax.nn.sigmoid(pred_logits_pts)
    num = 2.0 * jnp.einsum("qp,gp->qg", pr, gt_pts,
                           preferred_element_type=jnp.float32)
    den = pr.sum(-1)[:, None] + gt_pts.sum(-1)[None, :]
    return 1.0 - (num + eps) / (den + eps)


def class_weights(cfg: MaskBevConfig) -> jnp.ndarray:
    """Per-class CE weights; background (last index) down-weighted to 0.1
    unless reversed (ref mask_bev_panoptic_head.py:101-103)."""
    k = cfg.head_num_classes
    if cfg.head_reverse_class_weights:
        return jnp.concatenate(
            [jnp.full((k,), cfg.head_bg_cls_weight), jnp.ones((1,))])
    return jnp.concatenate([jnp.ones((k,)), jnp.full((1,), cfg.head_bg_cls_weight)])


def match_costs(
    rng: jax.Array,
    cls_logits: jax.Array,  # (B, Q, K+1)
    mask_logits: jax.Array,  # (B, Q, H, W)
    gt_labels: jax.Array,  # (B, G) int32 in [0, K)
    gt_masks: jax.Array,  # (B, G, H, W) float {0,1}
    gt_valid: jax.Array,  # (B, G) bool
    cfg: MaskBevConfig,
    match_coords: Optional[jax.Array] = None,  # (B, P, 2) test injection
    gt_crop: Optional[Tuple[jax.Array, jax.Array]] = None,  # (crops, origins)
) -> jax.Array:
    """(B, Q, G) Hungarian cost matrices for one head pass (stop-gradient)."""
    b = cls_logits.shape[0]
    num_pts = cfg.head_num_points
    gt_hw = gt_masks.shape[-2:]

    def per_image(pts, cls_l, mask_l, labels, masks, crop_pair):
        # matching is discrete (no gradient flows through the assignment —
        # the reference's HungarianAssigner runs under no_grad); cutting the
        # tape here prunes the cost construction (incl. the dense-sampling
        # hat matrices) from the backward entirely
        cls_l = jax.lax.stop_gradient(cls_l)
        mask_l = jax.lax.stop_gradient(mask_l)
        pred_pts = _sample_shared(mask_l, pts, cfg)  # (Q, P)
        if crop_pair is not None:
            crops, origins = crop_pair  # (G, S, S), (G, 2)
            loc = _crop_local_coords(
                pts[None], origins, gt_hw, crops.shape[-1])  # (G, P, 2)
            gt_pts = _sample_per(crops, loc, cfg)  # (G, P)
        else:
            gt_pts = _sample_shared(masks, pts, cfg)  # (G, P)
        scores = jax.nn.softmax(cls_l, axis=-1)
        cost_cls = -scores[:, labels]  # (Q, G)
        cost_mask = _binary_ce_cost(pred_pts, gt_pts)
        cost_dice = _dice_cost(pred_pts, gt_pts)
        return (
            cfg.head_cls_weight * cost_cls
            + cfg.head_mask_weight * cost_mask
            + cfg.head_dice_weight * cost_dice
        )

    if match_coords is None:
        keys = jax.random.split(rng, b)
        match_coords = jax.vmap(
            lambda k: jax.random.uniform(k, (num_pts, 2)))(keys)
    if gt_crop is not None:
        return jax.vmap(
            lambda p, c, m, l, cr, o: per_image(p, c, m, l, None, (cr, o)))(
            match_coords, cls_logits, mask_logits, gt_labels,
            gt_crop[0], gt_crop[1])
    return jax.vmap(
        lambda p, c, m, l, ms: per_image(p, c, m, l, ms, None))(
        match_coords, cls_logits, mask_logits, gt_labels,
        gt_masks.astype(mask_logits.dtype))


def match_layer(
    rng: jax.Array,
    cls_logits: jax.Array,
    mask_logits: jax.Array,
    gt_labels: jax.Array,
    gt_masks: jax.Array,
    gt_valid: jax.Array,
    cfg: MaskBevConfig,
    match_coords: Optional[jax.Array] = None,
    gt_crop: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> MatchResult:
    """Hungarian matching for one head pass over the batch."""
    costs = match_costs(rng, cls_logits, mask_logits, gt_labels, gt_masks,
                        gt_valid, cfg, match_coords=match_coords,
                        gt_crop=gt_crop)
    gt_of_query, matched = jax.vmap(match)(
        costs, gt_valid.sum(-1).astype(jnp.int32))
    return MatchResult(gt_of_query, matched)


def layer_losses(
    rng: jax.Array,
    cls_logits: jax.Array,
    mask_logits: jax.Array,
    height_logits: Optional[jax.Array],
    gt_labels: jax.Array,
    gt_masks: jax.Array,
    gt_valid: jax.Array,
    gt_heights: Optional[jax.Array],
    cfg: MaskBevConfig,
    match_coords: Optional[jax.Array] = None,  # (B, P, 2) test injection
    loss_coords: Optional[jax.Array] = None,  # (B*Q, P, 2) test injection
    gt_crop: Optional[Tuple[jax.Array, jax.Array]] = None,
    match_result: Optional[MatchResult] = None,  # precomputed assignment
) -> Tuple[Dict[str, jax.Array], MatchResult]:
    """Losses for one head pass. All reductions use GLOBAL batch statistics.

    ``match_result``: skip the in-layer Hungarian and use this assignment
    (``maskbev_loss`` batches the assignment of ALL layers into one vmapped
    solve — the JV while-loop is latency-bound, so L*B lockstep problems
    cost barely more than B). The rng SPLIT is unchanged either way, so
    loss values are bitwise-identical between the two paths.
    """
    # loss math stays float32 regardless of compute_dtype: the point-sampled
    # BCE/dice reductions (12544 points/query) lose precision in bf16
    mask_logits = mask_logits.astype(jnp.float32)
    b, q = cls_logits.shape[:2]
    k = cfg.head_num_classes
    gt_hw = gt_masks.shape[-2:]
    if gt_crop is None and _gt_crop_size(cfg, gt_hw):
        gt_crop = gt_crops(gt_masks, _gt_crop_size(cfg, gt_hw))[:2]
    rng_match, rng_pts = jax.random.split(rng)
    if match_result is None:
        mr = match_layer(
            rng_match, cls_logits, mask_logits, gt_labels, gt_masks,
            gt_valid, cfg, match_coords=match_coords, gt_crop=gt_crop)
    else:
        mr = match_result

    num_total_masks = jnp.maximum(gt_valid.sum().astype(jnp.float32), 1.0)

    # --- classification ---
    safe_gt = jnp.clip(mr.gt_of_query, 0, gt_labels.shape[1] - 1)
    matched_labels = jnp.take_along_axis(gt_labels, safe_gt, axis=1)
    labels = jnp.where(mr.matched, matched_labels, k)  # bg = index k
    cw = class_weights(cfg)
    logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = cw[labels]
    loss_cls = cfg.head_cls_weight * (ce * w).sum() / jnp.maximum(w.sum(), 1e-6)

    # --- mask + dice on uncertainty-sampled points ---
    flat_masks = mask_logits.reshape(b * q, *mask_logits.shape[2:])
    dense, _ = _sample_cfg(cfg)
    if loss_coords is None:
        n_over = int(cfg.head_num_points * cfg.head_oversample_ratio)
        coords = uncertain_point_coords(
            rng_pts, jax.lax.stop_gradient(flat_masks), cfg.head_num_points,
            cfg.head_oversample_ratio, cfg.head_importance_sample_ratio,
            # uncertainty values only rank points: bf16 matmuls are safe
            dense=dense, mm_dtype=jnp.bfloat16,
            chunk=_largest_divisor_leq(
                b * q, max(1, _CHUNK_BUDGET
                           // (n_over * mask_logits.shape[-2]))))
    else:
        coords = loss_coords
    pred_pts = _sample_per(flat_masks, coords, cfg)  # (B*Q, P)
    # target mask per query: matched gt mask (zeros when unmatched; weighted out)
    if gt_crop is not None:
        crops, origins = gt_crop
        s = crops.shape[-1]
        q_crops = jnp.take_along_axis(
            crops, safe_gt[..., None, None], axis=1)  # (B, Q, S, S)
        q_orig = jnp.take_along_axis(
            origins, safe_gt[..., None], axis=1)  # (B, Q, 2)
        loc = _crop_local_coords(
            coords.reshape(b, q, -1, 2), q_orig, gt_hw, s)
        tgt_pts = _sample_per(
            q_crops.reshape(b * q, s, s), loc.reshape(b * q, -1, 2), cfg)
    else:
        tgt = jnp.take_along_axis(
            gt_masks.astype(mask_logits.dtype),
            safe_gt[..., None, None], axis=1)  # (B, Q, H, W)
        flat_tgt = tgt.reshape(b * q, *tgt.shape[2:])
        tgt_pts = _sample_per(flat_tgt, coords, cfg)
    wmask = mr.matched.reshape(-1).astype(jnp.float32)  # (B*Q,)

    p = pred_pts.shape[-1]  # actual sampled points (== cfg.head_num_points
    # in production; injected coords may differ in tests)
    bce = (
        jax.nn.softplus(-pred_pts) * tgt_pts
        + jax.nn.softplus(pred_pts) * (1.0 - tgt_pts)
    ).sum(-1)
    loss_mask = cfg.head_mask_weight * (bce * wmask).sum() / (num_total_masks * p)

    pr = jax.nn.sigmoid(pred_pts)
    num = 2.0 * (pr * tgt_pts).sum(-1)
    den = pr.sum(-1) + tgt_pts.sum(-1)
    dice = 1.0 - (num + 1.0) / (den + 1.0)
    loss_dice = cfg.head_dice_weight * (dice * wmask).sum() / num_total_masks

    out = {"loss_cls": loss_cls, "loss_mask": loss_mask, "loss_dice": loss_dice}

    # --- optional height (12-way CE on matched queries; ref :380-382,451) ---
    if height_logits is not None and gt_heights is not None:
        hbin = jnp.clip(
            jnp.round((gt_heights - 1.0) / 0.2).astype(jnp.int32) + 1,
            0, cfg.head_num_height_bins - 1)
        tgt_h = jnp.take_along_axis(hbin, safe_gt, axis=1)  # (B, Q)
        logp_h = jax.nn.log_softmax(height_logits.astype(jnp.float32), axis=-1)
        ce_h = -jnp.take_along_axis(logp_h, tgt_h[..., None], axis=-1)[..., 0]
        wm = mr.matched.astype(jnp.float32)
        out["loss_height"] = (
            cfg.head_height_weight * (ce_h * wm).sum() / num_total_masks)
    return out, mr


def maskbev_loss(
    rng: jax.Array,
    outputs: DecoderOutputs,
    gt_labels: jax.Array,
    gt_masks: jax.Array,
    gt_valid: jax.Array,
    gt_heights: Optional[jax.Array],
    cfg: MaskBevConfig,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Deep-supervised loss over all L+1 head passes.

    GT masks are given at the pseudo-image resolution (H, W); the reference
    interpolates predictions to GT size for loss point-sampling — here both
    are sampled in normalized coords so no resize is needed.

    Returns (total_loss, dict of per-layer loss vectors + totals).
    """
    num_layers = outputs.cls_logits.shape[0]
    keys = jax.random.split(rng, num_layers)

    # GT masks are layer-invariant: compute per-instance crops ONCE and let
    # every deeply-supervised layer sample through them (see gt_crops)
    s = _gt_crop_size(cfg, gt_masks.shape[-2:])
    truncated = None
    gt_crop = None
    if s:
        crops, origins, truncated = gt_crops(gt_masks, s)
        gt_crop = (crops, origins)

    # ---- pass 1: per-layer matching costs (sequential lax.map: the dense
    # point-sampling intermediates are per-layer GB-scale; vmapping all L+1
    # head passes would multiply the transient footprint by the layer count)
    def layer_cost(key, cls_l, mask_l):
        rng_match, _ = jax.random.split(key)  # same split as layer_losses
        return match_costs(
            rng_match, cls_l, mask_l.astype(jnp.float32), gt_labels,
            gt_masks, gt_valid, cfg, gt_crop=gt_crop)

    costs = jax.lax.map(
        lambda a: layer_cost(*a),
        (keys, outputs.cls_logits, outputs.mask_logits))  # (L, B, Q, G)

    # ---- pass 2: ONE batched Hungarian solve for all L*B problems. The JV
    # while-loop is latency-bound (45 sequential augmenting paths), so
    # lockstep-vmapping 10x the problems costs barely more than one layer's
    # — this moved the train step's biggest single op off the critical path
    lcount, b = costs.shape[:2]
    nv = jnp.tile(gt_valid.sum(-1).astype(jnp.int32), lcount)
    gq, mt = jax.vmap(match)(costs.reshape((lcount * b,) + costs.shape[2:]),
                             nv)
    mrs = MatchResult(gq.reshape(lcount, b, -1), mt.reshape(lcount, b, -1))

    # ---- pass 3: per-layer losses under the precomputed assignments
    def one_layer(key, cls_l, mask_l, height_l, gt_of_query, matched):
        losses, _ = layer_losses(
            key, cls_l, mask_l, height_l, gt_labels, gt_masks, gt_valid,
            gt_heights, cfg, gt_crop=gt_crop,
            match_result=MatchResult(gt_of_query, matched))
        return losses

    if outputs.height_logits is not None:
        losses = jax.lax.map(
            lambda a: one_layer(*a),
            (keys, outputs.cls_logits, outputs.mask_logits,
             outputs.height_logits, mrs.gt_of_query, mrs.matched))
    else:
        losses = jax.lax.map(
            lambda a: one_layer(a[0], a[1], a[2], None, a[3], a[4]),
            (keys, outputs.cls_logits, outputs.mask_logits,
             mrs.gt_of_query, mrs.matched))

    # reference sums every '*loss*' entry across layers (mask_bev_module.py:193-195)
    total = sum(v.sum() for v in losses.values())
    logs = {f"{name}_layers": v for name, v in losses.items()}
    logs.update({name: v.sum() for name, v in losses.items()})
    logs["loss"] = total
    if truncated is not None:
        # instances whose bbox exceeds loss_gt_crop: their loss targets are
        # silently truncated — any nonzero here means the crop is too small
        # for the dataset (raise loss_gt_crop or lower the grid resolution)
        logs["gt_crop_truncated"] = (
            truncated & (gt_valid > 0)).sum().astype(jnp.float32)
    return total, logs
