"""Activation/loss/assignment parity: Mask2Former decoder + losses vs torch.

Torch re-expressions of the reference head pieces (reference
``mask2former_head.py:326-562`` forward loop with mmdet
Mask2FormerTransformerDecoderLayer semantics, and the loss path
``mask2former_head.py:246-426`` with the assigner config at
``mask_bev_panoptic_head.py:197-213``), random-init weights exported in
reference state_dict naming, converted with ``convert_torch_maskbev``, and
the full per-layer activations / cost matrices / assignments / loss scalars
compared. Point coords are injected identically on both sides (the reference
samples them with torch RNG; the coords themselves are the only
nondeterminism in the loss path).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from mask_bev_tpu.config import tiny_test_config  # noqa: E402
from mask_bev_tpu.models.convert import convert_torch_maskbev  # noqa: E402
from mask_bev_tpu.models.mask2former import Mask2FormerDecoder  # noqa: E402

C, HEADS, Q, LAYERS, NCLS = 32, 4, 6, 4, 2
FFN_DIM = 64


def _sine_pe_torch(h, w, num_feats, dtype=torch.float32):
    """mmdet SinePositionalEncoding(normalize=True) on an all-valid mask."""
    not_mask = torch.ones(1, h, w, dtype=dtype)
    y = not_mask.cumsum(1)
    x = not_mask.cumsum(2)
    eps, scale = 1e-6, 2 * np.pi
    y = y / (y[:, -1:, :] + eps) * scale
    x = x / (x[:, :, -1:] + eps) * scale
    dim_t = 10000.0 ** (
        2 * (torch.arange(num_feats, dtype=dtype) // 2) / num_feats)
    pos_x = x[:, :, :, None] / dim_t
    pos_y = y[:, :, :, None] / dim_t
    pos_x = torch.stack(
        (pos_x[:, :, :, 0::2].sin(), pos_x[:, :, :, 1::2].cos()),
        dim=4).flatten(3)
    pos_y = torch.stack(
        (pos_y[:, :, :, 0::2].sin(), pos_y[:, :, :, 1::2].cos()),
        dim=4).flatten(3)
    return torch.cat((pos_y, pos_x), dim=3).permute(0, 3, 1, 2)  # (1,C,h,w)


class TDecoderLayer(tnn.Module):
    """mmdet Mask2FormerTransformerDecoderLayer: cross -> norm -> self ->
    norm -> ffn -> norm, residuals inside each attention wrapper."""

    def __init__(self):
        super().__init__()
        self.cross_attn = tnn.MultiheadAttention(C, HEADS, batch_first=True)
        self.self_attn = tnn.MultiheadAttention(C, HEADS, batch_first=True)
        self.norms = tnn.ModuleList([tnn.LayerNorm(C) for _ in range(3)])
        self.fc1 = tnn.Linear(C, FFN_DIM)
        self.fc2 = tnn.Linear(FFN_DIM, C)

    def forward(self, query, key, value, query_pos, key_pos, cross_attn_mask):
        out, _ = self.cross_attn(
            query + query_pos, key + key_pos, value,
            attn_mask=cross_attn_mask, need_weights=False)
        query = self.norms[0](query + out)
        out, _ = self.self_attn(
            query + query_pos, query + query_pos, query, need_weights=False)
        query = self.norms[1](query + out)
        query = self.norms[2](query + self.fc2(tF.relu(self.fc1(query))))
        return query


class THead(tnn.Module):
    """Reference head forward (mask2former_head.py:473-562), tiny config."""

    def __init__(self, predict_height=True):
        super().__init__()
        self.layers = tnn.ModuleList([TDecoderLayer() for _ in range(LAYERS)])
        self.post_norm = tnn.LayerNorm(C)
        self.cls_embed = tnn.Linear(C, NCLS + 1)
        self.mask_embed = tnn.Sequential(
            tnn.Linear(C, C), tnn.ReLU(), tnn.Linear(C, C), tnn.ReLU(),
            tnn.Linear(C, C))
        self.height_embed = tnn.Linear(C, 12) if predict_height else None
        self.query_embed = tnn.Embedding(Q, C)
        self.query_feat = tnn.Embedding(Q, C)
        self.level_embed = tnn.Embedding(3, C)

    def _forward_head(self, decoder_out, mask_feature, target_size):
        decoder_out = self.post_norm(decoder_out)
        cls_pred = self.cls_embed(decoder_out)
        heights = (self.height_embed(decoder_out)
                   if self.height_embed is not None else None)
        mask_embed = self.mask_embed(decoder_out)
        mask_pred = torch.einsum("bqc,bchw->bqhw", mask_embed, mask_feature)
        attn_mask = tF.interpolate(
            mask_pred, target_size, mode="bilinear", align_corners=False)
        attn_mask = attn_mask.flatten(2).unsqueeze(1).repeat(
            (1, HEADS, 1, 1)).flatten(0, 1)
        attn_mask = (attn_mask.sigmoid() < 0.5).detach()
        return cls_pred, mask_pred, attn_mask, heights

    def forward(self, mask_features, memories):
        # memories: list of (B, C, h, w), low->high res
        b = mask_features.shape[0]
        inputs, pes, hws = [], [], []
        for i, mem in enumerate(memories):
            h, w = mem.shape[-2:]
            hws.append((h, w))
            flat = mem.flatten(2).permute(0, 2, 1)
            inputs.append(flat + self.level_embed.weight[i].view(1, 1, -1))
            pes.append(_sine_pe_torch(h, w, C // 2).flatten(2).permute(0, 2, 1))
        query_feat = self.query_feat.weight.unsqueeze(0).repeat(b, 1, 1)
        query_embed = self.query_embed.weight.unsqueeze(0).repeat(b, 1, 1)

        cls_list, mask_list, height_list = [], [], []
        cls_pred, mask_pred, attn_mask, heights = self._forward_head(
            query_feat, mask_features, hws[0])
        cls_list.append(cls_pred); mask_list.append(mask_pred)
        height_list.append(heights)
        for i, layer in enumerate(self.layers):
            lvl = i % 3
            attn_mask[torch.where(
                attn_mask.sum(-1) == attn_mask.shape[-1])] = False
            query_feat = layer(
                query=query_feat, key=inputs[lvl], value=inputs[lvl],
                query_pos=query_embed, key_pos=pes[lvl],
                cross_attn_mask=attn_mask)
            cls_pred, mask_pred, attn_mask, heights = self._forward_head(
                query_feat, mask_features, hws[(i + 1) % 3])
            cls_list.append(cls_pred); mask_list.append(mask_pred)
            height_list.append(heights)
        return cls_list, mask_list, height_list

    def export_state_dict(self):
        p = "_panoptic_head._panoptic_head."
        out = {}

        def put(k, t):
            out[p + k] = t.detach().numpy()

        put("query_feat.weight", self.query_feat.weight)
        put("query_embed.weight", self.query_embed.weight)
        put("level_embed.weight", self.level_embed.weight)
        put("transformer_decoder.post_norm.weight", self.post_norm.weight)
        put("transformer_decoder.post_norm.bias", self.post_norm.bias)
        put("cls_embed.weight", self.cls_embed.weight)
        put("cls_embed.bias", self.cls_embed.bias)
        for j in (0, 2, 4):
            put(f"mask_embed.{j}.weight", self.mask_embed[j].weight)
            put(f"mask_embed.{j}.bias", self.mask_embed[j].bias)
        if self.height_embed is not None:
            put("height_embed.weight", self.height_embed.weight)
            put("height_embed.bias", self.height_embed.bias)
        for i, layer in enumerate(self.layers):
            lp = f"transformer_decoder.layers.{i}."
            for kind, attn in (("cross_attn", layer.cross_attn),
                               ("self_attn", layer.self_attn)):
                put(lp + f"{kind}.attn.in_proj_weight", attn.in_proj_weight)
                put(lp + f"{kind}.attn.in_proj_bias", attn.in_proj_bias)
                put(lp + f"{kind}.attn.out_proj.weight", attn.out_proj.weight)
                put(lp + f"{kind}.attn.out_proj.bias", attn.out_proj.bias)
            for j, norm in enumerate(layer.norms):
                put(lp + f"norms.{j}.weight", norm.weight)
                put(lp + f"norms.{j}.bias", norm.bias)
            put(lp + "ffn.layers.0.0.weight", layer.fc1.weight)
            put(lp + "ffn.layers.0.0.bias", layer.fc1.bias)
            put(lp + "ffn.layers.1.weight", layer.fc2.weight)
            put(lp + "ffn.layers.1.bias", layer.fc2.bias)
        return out


def test_decoder_activations_match_torch():
    import jax
    import jax.numpy as jnp

    torch.manual_seed(0)
    tm = THead().eval()
    b = 2
    mask_features = torch.randn(b, C, 16, 16)
    memories = [torch.randn(b, C, 4, 4), torch.randn(b, C, 8, 8),
                torch.randn(b, C, 16, 16)]
    with torch.no_grad():
        t_cls, t_mask, t_height = tm(mask_features, memories)

    fm = Mask2FormerDecoder(
        num_queries=Q, num_classes=NCLS, num_layers=LAYERS, feat_channels=C,
        out_channels=C, num_heads=HEADS, ffn_dim=FFN_DIM, predict_height=True)
    mf = jnp.asarray(mask_features.permute(0, 2, 3, 1).numpy())
    mems = [jnp.asarray(m.permute(0, 2, 3, 1).numpy()) for m in memories]
    with jax.default_device(jax.devices("cpu")[0]):
        variables = fm.init(jax.random.PRNGKey(0), mf, mems, train=False)
        converted = convert_torch_maskbev(
            tm.export_state_dict(), {"params": {"decoder": variables["params"]}})
        out = fm.apply(
            {"params": converted["params"]["decoder"]}, mf, mems, train=False)

    for i in range(LAYERS + 1):
        np.testing.assert_allclose(
            np.asarray(out.cls_logits[i]), t_cls[i].numpy(),
            rtol=2e-3, atol=2e-4, err_msg=f"cls layer {i}")
        np.testing.assert_allclose(
            np.asarray(out.mask_logits[i]), t_mask[i].numpy(),
            rtol=2e-3, atol=5e-4, err_msg=f"mask layer {i}")
        np.testing.assert_allclose(
            np.asarray(out.height_logits[i]), t_height[i].numpy(),
            rtol=2e-3, atol=2e-4, err_msg=f"height layer {i}")


# ---------------------------------------------------------------------------
# loss / assignment parity
# ---------------------------------------------------------------------------


def _point_sample_torch(imgs, coords):
    """mmcv.ops.point_sample: [0,1] coords -> grid_sample(align_corners=False).

    imgs: (N, H, W); coords: (N, P, 2) xy. Returns (N, P).
    """
    grid = coords * 2.0 - 1.0
    out = tF.grid_sample(
        imgs.unsqueeze(1), grid.unsqueeze(2), mode="bilinear",
        padding_mode="zeros", align_corners=False)
    return out[:, 0, :, 0]


def _reference_loss_torch(cls_scores, mask_preds, gt_labels, gt_masks,
                          n_valid, match_coords, loss_coords, cfg):
    """Reference ``_loss_by_feat_single`` (mask2former_head.py:335-426) with
    injected point coords; returns (loss_cls, loss_mask, loss_dice,
    per-image assignments)."""
    from scipy.optimize import linear_sum_assignment

    b, q = cls_scores.shape[:2]
    k = cfg.head_num_classes
    class_weight = torch.tensor([1.0] * k + [cfg.head_bg_cls_weight])

    labels_all, mask_weights, assignments = [], [], []
    pos_gt_masks, pos_query_rows = [], []
    avg_factor = 0
    for i in range(b):
        g = int(n_valid[i])
        avg_factor += g
        coords = match_coords[i]
        pred_pts = _point_sample_torch(
            mask_preds[i], coords.unsqueeze(0).repeat(q, 1, 1))
        gt_pts = _point_sample_torch(
            gt_masks[i, :g].float(), coords.unsqueeze(0).repeat(g, 1, 1))
        # mmdet ClassificationCost / CrossEntropyLossCost / DiceCost
        scores = cls_scores[i].softmax(-1)
        cost_cls = -scores[:, gt_labels[i, :g]]
        p = pred_pts.shape[1]
        pos = tF.binary_cross_entropy_with_logits(
            pred_pts, torch.ones_like(pred_pts), reduction="none")
        neg = tF.binary_cross_entropy_with_logits(
            pred_pts, torch.zeros_like(pred_pts), reduction="none")
        cost_mask = (torch.einsum("qp,gp->qg", pos, gt_pts)
                     + torch.einsum("qp,gp->qg", neg, 1 - gt_pts)) / p
        pr = pred_pts.sigmoid()
        num = 2 * torch.einsum("qp,gp->qg", pr, gt_pts)
        den = pr.sum(-1)[:, None] + gt_pts.sum(-1)[None, :]
        cost_dice = 1 - (num + 1.0) / (den + 1.0)
        cost = (cfg.head_cls_weight * cost_cls
                + cfg.head_mask_weight * cost_mask
                + cfg.head_dice_weight * cost_dice)
        rows, cols = linear_sum_assignment(cost.numpy())
        gt_of_query = np.full(q, -1, np.int64)
        gt_of_query[rows] = cols
        assignments.append(gt_of_query)

        labels = torch.full((q,), k, dtype=torch.long)
        labels[rows] = gt_labels[i, :g][cols]
        labels_all.append(labels)
        mw = torch.zeros(q)
        mw[rows] = 1.0
        mask_weights.append(mw)
        order = np.argsort(rows)  # row-major positive order
        for r in rows[order]:
            pos_query_rows.append(i * q + r)
        pos_gt_masks.append(gt_masks[i, :g][cols[order]])

    labels = torch.stack(labels_all).flatten()
    ce = tF.cross_entropy(
        cls_scores.flatten(0, 1), labels, weight=class_weight,
        reduction="none")
    # mmdet CrossEntropyLoss(class_weight) applies the weight inside
    # cross_entropy; avg_factor = class_weight[labels].sum()
    loss_cls = 2.0 * ce.sum() / class_weight[labels].sum()

    num_total_masks = max(avg_factor, 1)
    mask_targets = torch.cat(pos_gt_masks).float()  # (Npos, H, W)
    pos_rows = torch.tensor(pos_query_rows, dtype=torch.long)
    mask_pred_pos = mask_preds.flatten(0, 1)[pos_rows]
    coords_pos = loss_coords[pos_rows]
    p = coords_pos.shape[1]
    mask_point_preds = _point_sample_torch(mask_pred_pos, coords_pos)
    mask_point_targets = _point_sample_torch(mask_targets, coords_pos)
    loss_dice_v = 1 - (2 * (mask_point_preds.sigmoid() * mask_point_targets
                            ).sum(-1) + 1.0) / (
        mask_point_preds.sigmoid().sum(-1) + mask_point_targets.sum(-1) + 1.0)
    loss_dice = 5.0 * loss_dice_v.sum() / num_total_masks
    bce = tF.binary_cross_entropy_with_logits(
        mask_point_preds, mask_point_targets, reduction="none")
    loss_mask = 5.0 * bce.sum() / (num_total_masks * p)
    return loss_cls, loss_mask, loss_dice, assignments


def test_losses_and_assignment_match_torch():
    import jax
    import jax.numpy as jnp

    from mask_bev_tpu.losses import layer_losses

    cfg = tiny_test_config().replace(head_num_classes=NCLS)
    rng = np.random.default_rng(3)
    b, q, h, w, g, p = 3, cfg.num_queries, 12, 12, 5, 64
    cls_logits = rng.normal(size=(b, q, NCLS + 1)).astype(np.float32)
    mask_logits = rng.normal(size=(b, q, h, w)).astype(np.float32) * 2.0
    gt_labels = rng.integers(0, NCLS, size=(b, g)).astype(np.int32)
    gt_masks = (rng.uniform(size=(b, g, h, w)) < 0.3).astype(np.float32)
    n_valid = np.array([g, 2, 3])
    gt_valid = np.arange(g)[None, :] < n_valid[:, None]
    match_coords = rng.uniform(size=(b, p, 2)).astype(np.float32)
    loss_coords = rng.uniform(size=(b * q, p, 2)).astype(np.float32)

    with jax.default_device(jax.devices("cpu")[0]):
        losses, mr = layer_losses(
            jax.random.PRNGKey(0), jnp.asarray(cls_logits),
            jnp.asarray(mask_logits), None, jnp.asarray(gt_labels),
            jnp.asarray(gt_masks), jnp.asarray(gt_valid), None, cfg,
            match_coords=jnp.asarray(match_coords),
            loss_coords=jnp.asarray(loss_coords))
        gt_of_query = np.asarray(mr.gt_of_query)
        losses = {n: float(v) for n, v in losses.items()}

    t_cls, t_mask, t_dice, t_assign = _reference_loss_torch(
        torch.tensor(cls_logits), torch.tensor(mask_logits),
        torch.tensor(gt_labels, dtype=torch.long), torch.tensor(gt_masks),
        n_valid, torch.tensor(match_coords), torch.tensor(loss_coords), cfg)

    for i in range(b):
        np.testing.assert_array_equal(
            gt_of_query[i], t_assign[i],
            err_msg=f"Hungarian assignment differs (image {i})")
    np.testing.assert_allclose(losses["loss_cls"], float(t_cls), rtol=1e-5)
    np.testing.assert_allclose(losses["loss_mask"], float(t_mask), rtol=1e-5)
    np.testing.assert_allclose(losses["loss_dice"], float(t_dice), rtol=1e-5)
