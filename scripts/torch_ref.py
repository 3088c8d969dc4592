"""Torch re-expression of the REFERENCE MaskBEV architecture (tiny dims).

Evidence tooling for the synthetic cross-implementation end-metric harness
(``scripts/accuracy_harness.py``) — NOT part of the library. Where the flax
model deliberately deviates (conv-FPN pixel decoder), this model implements
what the reference actually runs — mmdet's ``MSDeformAttnPixelDecoder``
(multi-scale deformable attention encoder) — so training both on identical
fixtures measures the END-METRIC impact of the deviation, which is the only
parity that is possible by construction (docs/ARCHITECTURE.md deviation #1).

Architecture sources (re-expressed, not copied):
  * PFN encoder + scatter: reference ``mask_bev_encoders.py:69-92`` with
    mmdet3d PillarFeatureNet semantics (incl. BN over K-padded rows of
    occupied pillars — the dynamic-shape BN our masked BN replaces);
  * Swin backbone: reference vendored ``swin.py`` (mmdet flavor);
  * pixel decoder: mmdet ``MSDeformAttnPixelDecoder`` configured at
    reference ``mask_bev_panoptic_head.py:120-146`` (3 encoder levels,
    deformable self-attention, top-down to /4);
  * head + losses: reference ``mask2former_head.py:246-562`` (the decoder
    layer / loss pieces mirror ``tests/test_torch_parity_head.py``, already
    proven equal to the flax head to rtol 1e-5).
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# --------------------------------------------------------------------------
# encoder: PFN + scatter + LayerNorm([C, H, W])
# --------------------------------------------------------------------------


class TPFN(nn.Module):
    """mmdet3d PillarFeatureNet on dense (P, K, 4) voxel features."""

    def __init__(self, feat_channels, k, voxel_size, x0, y0):
        super().__init__()
        self.k, self.voxel_size, self.x0, self.y0 = k, voxel_size, x0, y0
        in_dim = 4 + 3 + 2 + 1  # raw + cluster offset + center offset + dist
        self.linears, self.norms = nn.ModuleList(), nn.ModuleList()
        self.units = []
        nl = len(feat_channels)
        for i, ch in enumerate(feat_channels):
            units = ch if i == nl - 1 else ch // 2
            self.linears.append(nn.Linear(in_dim, units, bias=False))
            self.norms.append(nn.BatchNorm1d(units, eps=1e-3, momentum=0.01))
            self.units.append(units)
            in_dim = 2 * units

    def forward(self, feats, num_points, coords, pillar_valid):
        # feats (B, P, K, 4); coords (B, P, 2) = (iy, ix); valid (B, P)
        b, p, k, _ = feats.shape
        ptmask = (torch.arange(k, device=feats.device)[None, None, :]
                  < num_points[..., None])  # (B, P, K)
        xyz = feats[..., :3]
        cnt = num_points.clamp(min=1).float()[..., None, None]
        mean = (xyz * ptmask[..., None]).sum(-2, keepdim=True) / cnt
        cx = (coords[..., 1].float() + 0.5) * self.voxel_size + self.x0
        cy = (coords[..., 0].float() + 0.5) * self.voxel_size + self.y0
        center = torch.stack([cx, cy], -1)[..., None, :]  # (B, P, 1, 2)
        dist = xyz.norm(dim=-1, keepdim=True)
        x = torch.cat(
            [feats, xyz - mean, feats[..., :2] - center, dist], -1)
        x = x * ptmask[..., None]

        # reference semantics: BN over the dynamic (M, K) rows of OCCUPIED
        # pillars (K-padding zeros included), never over empty pillars
        for lin, bn in zip(self.linears, self.norms):
            y = lin(x)
            ym = y[pillar_valid]                       # (M, K, C) dynamic
            ym = bn(ym.transpose(1, 2)).transpose(1, 2)
            y = torch.zeros_like(y)
            y[pillar_valid] = ym
            y = F.relu(y) * ptmask[..., None]
            pooled = y.max(dim=-2, keepdim=True).values
            last = lin is self.linears[-1]
            x = (pooled[..., 0, :] if last
                 else torch.cat([y, pooled.expand_as(y)], -1))
        return x * pillar_valid[..., None]             # (B, P, C)


class TEncoder(nn.Module):
    """PFN + PointPillarsScatter + nn.LayerNorm([C, H, W])."""

    def __init__(self, feat_channels, k, voxel_size, x0, y0, grid_hw):
        super().__init__()
        self.pfn = TPFN(feat_channels, k, voxel_size, x0, y0)
        self.grid_hw = grid_hw
        self.norm = nn.LayerNorm([feat_channels[-1], *grid_hw])

    def forward(self, feats, num_points, coords, pillar_valid):
        table = self.pfn(feats, num_points, coords, pillar_valid)
        b, _, c = table.shape
        h, w = self.grid_hw
        canvas = table.new_zeros(b, h * w, c)
        idx = (coords[..., 0].clamp(min=0) * w
               + coords[..., 1].clamp(min=0)).long()
        canvas.scatter_(1, idx[..., None].expand(-1, -1, c),
                        table * pillar_valid[..., None])
        canvas = canvas.view(b, h, w, c).permute(0, 3, 1, 2)
        return self.norm(canvas)                       # (B, C, H, W)


# --------------------------------------------------------------------------
# Swin backbone (mmdet flavor), N stages
# --------------------------------------------------------------------------


def _rel_index(w):
    coords = torch.stack(torch.meshgrid(
        torch.arange(w), torch.arange(w), indexing="ij")).flatten(1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)


class TWindowMSA(nn.Module):
    def __init__(self, dim, heads, window):
        super().__init__()
        self.h, self.window = heads, window
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * window - 1) ** 2, heads) * 0.02)
        self.register_buffer("rpi", _rel_index(window))

    def forward(self, x, mask=None):
        b_, n, c = x.shape
        qkv = self.qkv(x).reshape(b_, n, 3, self.h, c // self.h).permute(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0] * self.scale, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[self.rpi.view(-1)].view(
            n, n, self.h).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, self.h, n, n) + mask[None, :, None]
            attn = attn.view(b_, self.h, n, n)
        attn = attn.softmax(-1)
        return self.proj((attn @ v).transpose(1, 2).reshape(b_, n, c))


class TSwinBlock(nn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.window, self.shift = window, (window // 2 if shift else 0)
        self.norm1 = nn.LayerNorm(dim)
        self.attn = TWindowMSA(dim, heads, window)
        self.norm2 = nn.LayerNorm(dim)
        self.fc1 = nn.Linear(dim, 4 * dim)
        self.fc2 = nn.Linear(4 * dim, dim)

    def forward(self, x, hw):
        h, w = hw
        b, _, c = x.shape
        win = self.window
        shortcut = x
        y = self.norm1(x).view(b, h, w, c)
        hp, wp = -(-h // win) * win, -(-w // win) * win
        y = F.pad(y, (0, 0, 0, wp - w, 0, hp - h))
        s = 0 if min(hp, wp) == win else self.shift
        if s:
            y = torch.roll(y, (-s, -s), dims=(1, 2))
            img = torch.zeros(hp, wp)
            cnt = 0
            for hs in (slice(0, -win), slice(-win, -s), slice(-s, None)):
                for ws in (slice(0, -win), slice(-win, -s), slice(-s, None)):
                    img[hs, ws] = cnt
                    cnt += 1
            mw = img.view(hp // win, win, wp // win, win).permute(
                0, 2, 1, 3).reshape(-1, win * win)
            mask = torch.where(mw[:, None, :] != mw[:, :, None],
                               torch.tensor(-100.0), torch.tensor(0.0))
        else:
            mask = None
        yw = y.view(b, hp // win, win, wp // win, win, c).permute(
            0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)
        yw = self.attn(yw, mask)
        y = yw.view(b, hp // win, wp // win, win, win, c).permute(
            0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        if s:
            y = torch.roll(y, (s, s), dims=(1, 2))
        y = y[:, :h, :w].reshape(b, h * w, c)
        x = shortcut + y
        return x + self.fc2(F.gelu(self.fc1(self.norm2(x))))


class TPatchMerging(nn.Module):
    """mmdet flavor: nn.Unfold(2, stride=2) channel-major concat."""

    def __init__(self, dim):
        super().__init__()
        self.norm = nn.LayerNorm(4 * dim)
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x, hw):
        h, w = hw
        b, _, c = x.shape
        xc = x.view(b, h, w, c).permute(0, 3, 1, 2)
        xc = F.unfold(xc, 2, stride=2)
        return (self.reduction(self.norm(xc.transpose(1, 2))),
                (h // 2, w // 2))


class TSwin(nn.Module):
    """N-stage Swin (mmdet flavor), all stages output (NCHW pyramid)."""

    def __init__(self, in_ch, embed, depths, heads, window, patch=4):
        super().__init__()
        self.proj = nn.Conv2d(in_ch, embed, patch, stride=patch)
        self.pnorm = nn.LayerNorm(embed)
        self.stages, self.merges, self.outs = (
            nn.ModuleList(), nn.ModuleList(), nn.ModuleList())
        dim = embed
        for si, (d, hds) in enumerate(zip(depths, heads)):
            self.stages.append(nn.ModuleList(
                [TSwinBlock(dim, hds, window, b % 2 == 1) for b in range(d)]))
            self.outs.append(nn.LayerNorm(dim))
            if si < len(depths) - 1:
                self.merges.append(TPatchMerging(dim))
                dim *= 2

    def forward(self, img):                            # (B, C, H, W)
        x = self.proj(img)
        b, c, gh, gw = x.shape
        x = self.pnorm(x.flatten(2).transpose(1, 2))
        hw = (gh, gw)
        feats = []
        for si, blocks in enumerate(self.stages):
            for blk in blocks:
                x = blk(x, hw)
            o = self.outs[si](x).view(b, *hw, -1).permute(0, 3, 1, 2)
            feats.append(o)                            # (B, Ci, hi, wi)
            if si < len(self.merges):
                x, hw = self.merges[si](x, hw)
        return feats


# --------------------------------------------------------------------------
# MSDeformAttnPixelDecoder (the architecture the flax conv-FPN replaces)
# --------------------------------------------------------------------------


def _sine_pe(h, w, num_feats, dtype=torch.float32):
    """mmdet SinePositionalEncoding(normalize=True), all-valid mask."""
    not_mask = torch.ones(1, h, w, dtype=dtype)
    y = not_mask.cumsum(1)
    x = not_mask.cumsum(2)
    eps, scale = 1e-6, 2 * math.pi
    y = y / (y[:, -1:, :] + eps) * scale
    x = x / (x[:, :, -1:] + eps) * scale
    dim_t = 10000.0 ** (
        2 * (torch.arange(num_feats, dtype=dtype) // 2) / num_feats)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = torch.stack(
        (pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()), 4).flatten(3)
    pos_y = torch.stack(
        (pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()), 4).flatten(3)
    return torch.cat((pos_y, pos_x), 3).permute(0, 3, 1, 2)  # (1, C, h, w)


def _ms_deform_attn_core(value, shapes, locs, weights):
    """Pure-pytorch multi-scale deformable attention sampling.

    value (B, V, H, hd); shapes [(h, w)] per level; locs
    (B, Q, H, L, P, 2) in [0, 1]; weights (B, Q, H, L, P).
    """
    b, _, nh, hd = value.shape
    chunks = value.split([h * w for h, w in shapes], dim=1)
    out = []
    for lvl, (h, w) in enumerate(shapes):
        v = chunks[lvl].permute(0, 2, 3, 1).reshape(b * nh, hd, h, w)
        g = (2 * locs[:, :, :, lvl] - 1).permute(0, 2, 1, 3, 4).reshape(
            b * nh, -1, locs.shape[4], 2)              # (B*H, Q, P, 2)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)         # (B*H, hd, Q, P)
        out.append(s)
    out = torch.stack(out, dim=-2)                     # (B*H, hd, Q, L, P)
    wts = weights.permute(0, 2, 1, 3, 4).reshape(
        b * nh, 1, -1, len(shapes), locs.shape[4])
    return (out * wts).sum((-2, -1)).view(
        b, nh, hd, -1).permute(0, 3, 1, 2).reshape(b, -1, nh * hd)


class TMSDeformAttn(nn.Module):
    def __init__(self, dim, heads=8, levels=3, points=4):
        super().__init__()
        self.h, self.l, self.p = heads, levels, points
        self.sampling_offsets = nn.Linear(dim, heads * levels * points * 2)
        self.attention_weights = nn.Linear(dim, heads * levels * points)
        self.value_proj = nn.Linear(dim, dim)
        self.output_proj = nn.Linear(dim, dim)
        # mmdet init: offsets start as a ring of unit steps per head
        nn.init.zeros_(self.sampling_offsets.weight)
        th = torch.arange(heads) * (2 * math.pi / heads)
        grid = torch.stack([th.cos(), th.sin()], -1)
        grid = grid / grid.abs().max(-1, keepdim=True).values
        grid = grid.view(heads, 1, 1, 2).repeat(1, levels, points, 1)
        grid *= torch.arange(1, points + 1).view(1, 1, points, 1)
        with torch.no_grad():
            self.sampling_offsets.bias.copy_(grid.reshape(-1))
        nn.init.zeros_(self.attention_weights.weight)
        nn.init.zeros_(self.attention_weights.bias)

    def forward(self, query, value, shapes, ref_points):
        # query/value (B, V, C); ref_points (B, V, 2) normalized per query
        b, n, c = query.shape
        v = self.value_proj(value).view(b, -1, self.h, c // self.h)
        off = self.sampling_offsets(query).view(
            b, n, self.h, self.l, self.p, 2)
        wts = self.attention_weights(query).view(
            b, n, self.h, self.l * self.p).softmax(-1).view(
            b, n, self.h, self.l, self.p)
        normalizer = torch.tensor(
            [[w, h] for h, w in shapes], dtype=torch.float32)  # (L, 2) xy
        locs = (ref_points[:, :, None, None, None]
                + off / normalizer[None, None, None, :, None])
        return self.output_proj(_ms_deform_attn_core(v, shapes, locs, wts))


class TDeformEncoderLayer(nn.Module):
    def __init__(self, dim, heads, ffn_dim):
        super().__init__()
        self.attn = TMSDeformAttn(dim, heads)
        self.norm1 = nn.LayerNorm(dim)
        self.fc1 = nn.Linear(dim, ffn_dim)
        self.fc2 = nn.Linear(ffn_dim, dim)
        self.norm2 = nn.LayerNorm(dim)

    def forward(self, x, pos, shapes, ref):
        x = self.norm1(x + self.attn(x + pos, x, shapes, ref))
        return self.norm2(x + self.fc2(F.relu(self.fc1(x))))


class TMSDeformPixelDecoder(nn.Module):
    """mmdet MSDeformAttnPixelDecoder: deformable encoder over the 3
    coarsest levels, top-down to /4. Returns (mask_features (B, out, H/4,
    W/4), memories [/32, /16, /8] with feat_ch channels, NCHW)."""

    def __init__(self, in_channels, feat_ch, out_ch, num_layers=6,
                 heads=8, ffn_dim=None):
        super().__init__()
        self.input_convs = nn.ModuleList()   # for /8, /16, /32 (idx 1..3)
        for c in in_channels[1:]:
            self.input_convs.append(nn.Sequential(
                nn.Conv2d(c, feat_ch, 1), nn.GroupNorm(32, feat_ch)))
        self.level_encoding = nn.Embedding(3, feat_ch)
        self.layers = nn.ModuleList([
            TDeformEncoderLayer(feat_ch, heads, ffn_dim or 4 * feat_ch)
            for _ in range(num_layers)])
        self.lateral = nn.Sequential(
            nn.Conv2d(in_channels[0], feat_ch, 1), nn.GroupNorm(32, feat_ch))
        self.output_conv = nn.Sequential(
            nn.Conv2d(feat_ch, feat_ch, 3, padding=1),
            nn.GroupNorm(32, feat_ch), nn.ReLU())
        self.mask_feature = nn.Conv2d(feat_ch, out_ch, 3, padding=1)

    def forward(self, feats):                          # [/4, /8, /16, /32]
        # encoder tokens: coarsest first (/32, /16, /8), like mmdet
        shapes, tokens, poses, refs = [], [], [], []
        for lvl, i in enumerate((3, 2, 1)):
            x = self.input_convs[i - 1](feats[i])
            b, c, h, w = x.shape
            shapes.append((h, w))
            tokens.append(x.flatten(2).transpose(1, 2))
            pe = _sine_pe(h, w, c // 2).flatten(2).transpose(1, 2)
            poses.append(pe + self.level_encoding.weight[lvl])
            ys, xs = torch.meshgrid(
                (torch.arange(h) + 0.5) / h, (torch.arange(w) + 0.5) / w,
                indexing="ij")
            refs.append(torch.stack([xs, ys], -1).view(1, h * w, 2))
        x = torch.cat(tokens, 1)
        pos = torch.cat(poses, 1).expand(x.shape[0], -1, -1)
        ref = torch.cat(refs, 1).expand(x.shape[0], -1, -1)
        for layer in self.layers:
            x = layer(x, pos, shapes, ref)
        outs = []
        for lvl, chunk in enumerate(
                x.split([h * w for h, w in shapes], dim=1)):
            h, w = shapes[lvl]
            outs.append(chunk.transpose(1, 2).reshape(-1, chunk.shape[-1],
                                                      h, w))
        # outs = [/32, /16, /8]; top-down to /4
        y = self.lateral(feats[0]) + F.interpolate(
            outs[2], size=feats[0].shape[-2:], mode="bilinear",
            align_corners=False)
        y = self.output_conv(y)
        return self.mask_feature(y), outs


# --------------------------------------------------------------------------
# Mask2Former head (generalized from tests/test_torch_parity_head.py THead,
# proven equal to the flax head at tiny dims)
# --------------------------------------------------------------------------


class TDecoderLayer(nn.Module):
    def __init__(self, c, heads, ffn_dim):
        super().__init__()
        self.cross_attn = nn.MultiheadAttention(c, heads, batch_first=True)
        self.self_attn = nn.MultiheadAttention(c, heads, batch_first=True)
        self.norms = nn.ModuleList([nn.LayerNorm(c) for _ in range(3)])
        self.fc1 = nn.Linear(c, ffn_dim)
        self.fc2 = nn.Linear(ffn_dim, c)
        self.heads = heads

    def forward(self, query, key, value, query_pos, key_pos, cross_mask):
        out, _ = self.cross_attn(query + query_pos, key + key_pos, value,
                                 attn_mask=cross_mask, need_weights=False)
        query = self.norms[0](query + out)
        out, _ = self.self_attn(query + query_pos, query + query_pos, query,
                                need_weights=False)
        query = self.norms[1](query + out)
        return self.norms[2](query + self.fc2(F.relu(self.fc1(query))))


class THead(nn.Module):
    def __init__(self, c, heads, q, layers, ncls, ffn_dim, out_ch):
        super().__init__()
        self.heads, self.q = heads, q
        self.layers = nn.ModuleList(
            [TDecoderLayer(c, heads, ffn_dim) for _ in range(layers)])
        self.post_norm = nn.LayerNorm(c)
        self.cls_embed = nn.Linear(c, ncls + 1)
        self.mask_embed = nn.Sequential(
            nn.Linear(c, c), nn.ReLU(), nn.Linear(c, c), nn.ReLU(),
            nn.Linear(c, out_ch))
        self.query_embed = nn.Embedding(q, c)
        self.query_feat = nn.Embedding(q, c)
        self.level_embed = nn.Embedding(3, c)

    def _forward_head(self, decoder_out, mask_feature, target_size):
        decoder_out = self.post_norm(decoder_out)
        cls_pred = self.cls_embed(decoder_out)
        mask_embed = self.mask_embed(decoder_out)
        mask_pred = torch.einsum("bqc,bchw->bqhw", mask_embed, mask_feature)
        attn_mask = F.interpolate(mask_pred, target_size, mode="bilinear",
                                  align_corners=False)
        attn_mask = attn_mask.flatten(2).unsqueeze(1).repeat(
            (1, self.heads, 1, 1)).flatten(0, 1)
        return cls_pred, mask_pred, (attn_mask.sigmoid() < 0.5).detach()

    def forward(self, mask_features, memories):
        # memories: [/32, /16, /8] NCHW (pixel-decoder order)
        b = mask_features.shape[0]
        c = self.query_feat.weight.shape[1]
        inputs, pes, hws = [], [], []
        for i, mem in enumerate(memories):
            h, w = mem.shape[-2:]
            hws.append((h, w))
            flat = mem.flatten(2).permute(0, 2, 1)
            inputs.append(flat + self.level_embed.weight[i].view(1, 1, -1))
            pes.append(_sine_pe(h, w, c // 2).flatten(2).permute(0, 2, 1))
        query_feat = self.query_feat.weight.unsqueeze(0).repeat(b, 1, 1)
        query_embed = self.query_embed.weight.unsqueeze(0).repeat(b, 1, 1)

        cls_list, mask_list = [], []
        cls_pred, mask_pred, attn_mask = self._forward_head(
            query_feat, mask_features, hws[0])
        cls_list.append(cls_pred)
        mask_list.append(mask_pred)
        for i, layer in enumerate(self.layers):
            lvl = i % 3
            attn_mask[torch.where(
                attn_mask.sum(-1) == attn_mask.shape[-1])] = False
            query_feat = layer(
                query=query_feat, key=inputs[lvl], value=inputs[lvl],
                query_pos=query_embed, key_pos=pes[lvl],
                cross_mask=attn_mask)
            cls_pred, mask_pred, attn_mask = self._forward_head(
                query_feat, mask_features, hws[(i + 1) % 3])
            cls_list.append(cls_pred)
            mask_list.append(mask_pred)
        return cls_list, mask_list


class TMaskBev(nn.Module):
    """Full torch reference model at config-driven dims."""

    def __init__(self, cfg):
        super().__init__()
        h = int(round((cfg.y_range[1] - cfg.y_range[0]) / cfg.voxel_size))
        w = int(round((cfg.x_range[1] - cfg.x_range[0]) / cfg.voxel_size))
        self.encoder = TEncoder(
            tuple(cfg.encoder_feat_channels), cfg.max_num_points,
            cfg.voxel_size, cfg.x_range[0], cfg.y_range[0], (h, w))
        e = cfg.backbone_embed_dim
        self.backbone = TSwin(
            cfg.encoder_feat_channels[-1], e, tuple(cfg.backbone_depths),
            tuple(cfg.backbone_num_heads), cfg.backbone_window_size,
            patch=cfg.backbone_strides[0])
        self.pixel_decoder = TMSDeformPixelDecoder(
            [e, 2 * e, 4 * e, 8 * e], cfg.head_feat_channels,
            cfg.head_out_channels, num_layers=6,
            heads=cfg.head_num_attn_heads)
        self.head = THead(
            cfg.head_feat_channels, cfg.head_num_attn_heads,
            cfg.num_queries, cfg.head_num_decoder_layers,
            cfg.head_num_classes, cfg.head_ffn_dim, cfg.head_out_channels)

    def forward(self, feats, num_points, coords, pillar_valid):
        x = self.encoder(feats, num_points, coords, pillar_valid)
        pyramid = self.backbone(x)
        mask_features, memories = self.pixel_decoder(pyramid)
        return self.head(mask_features, memories)


# --------------------------------------------------------------------------
# reference loss (mask2former_head.py:246-426) with PointRend sampling
# --------------------------------------------------------------------------


def _point_sample(imgs, coords):
    grid = coords * 2.0 - 1.0
    out = F.grid_sample(imgs.unsqueeze(1), grid.unsqueeze(2),
                        mode="bilinear", padding_mode="zeros",
                        align_corners=False)
    return out[:, 0, :, 0]


def _uncertain_coords(masks, n, oversample, importance):
    """mmdet get_uncertain_point_coords_with_randomness."""
    m = masks.shape[0]
    n_over = int(n * oversample)
    n_imp = int(importance * n)
    coords = torch.rand(m, n_over, 2)
    with torch.no_grad():
        logits = _point_sample(masks, coords)
    idx = (-logits.abs()).topk(n_imp, dim=1).indices
    imp = torch.gather(coords, 1, idx[..., None].expand(-1, -1, 2))
    return torch.cat([imp, torch.rand(m, n - n_imp, 2)], 1)


def reference_loss(cls_scores, mask_preds, gt_labels, gt_masks, gt_valid,
                   cfg):
    """Single-layer loss: Hungarian matching on uniformly-sampled points,
    CE + point-sampled BCE/dice with the reference's avg factors."""
    from scipy.optimize import linear_sum_assignment

    b, q = cls_scores.shape[:2]
    k = cfg.head_num_classes
    class_weight = torch.tensor([1.0] * k + [cfg.head_bg_cls_weight])
    if cfg.head_reverse_class_weights:
        class_weight = class_weight.flip(0)

    p_match = cfg.head_num_points
    labels_all, pos_gt, pos_rows = [], [], []
    avg_factor = 0
    for i in range(b):
        g = int(gt_valid[i].sum())
        avg_factor += g
        coords = torch.rand(1, p_match, 2)
        pred_pts = _point_sample(mask_preds[i],
                                 coords.expand(q, -1, -1))
        if g == 0:
            labels_all.append(torch.full((q,), k, dtype=torch.long))
            continue
        gt_pts = _point_sample(gt_masks[i, :g].float(),
                               coords.expand(g, -1, -1))
        scores = cls_scores[i].softmax(-1)
        cost_cls = -scores[:, gt_labels[i, :g]]
        pos = F.binary_cross_entropy_with_logits(
            pred_pts, torch.ones_like(pred_pts), reduction="none")
        neg = F.binary_cross_entropy_with_logits(
            pred_pts, torch.zeros_like(pred_pts), reduction="none")
        cost_mask = (torch.einsum("qp,gp->qg", pos, gt_pts)
                     + torch.einsum("qp,gp->qg", neg, 1 - gt_pts)) / p_match
        pr = pred_pts.sigmoid()
        num = 2 * torch.einsum("qp,gp->qg", pr, gt_pts)
        den = pr.sum(-1)[:, None] + gt_pts.sum(-1)[None, :]
        cost_dice = 1 - (num + 1.0) / (den + 1.0)
        cost = (cfg.head_cls_weight * cost_cls
                + cfg.head_mask_weight * cost_mask
                + cfg.head_dice_weight * cost_dice)
        rows, cols = linear_sum_assignment(cost.detach().numpy())
        labels = torch.full((q,), k, dtype=torch.long)
        labels[rows] = gt_labels[i, :g][cols]
        labels_all.append(labels)
        order = np.argsort(rows)
        for r in rows[order]:
            pos_rows.append(i * q + r)
        pos_gt.append(gt_masks[i, :g][cols[order]])

    labels = torch.stack(labels_all).flatten()
    ce = F.cross_entropy(cls_scores.flatten(0, 1), labels,
                         weight=class_weight, reduction="none")
    loss_cls = cfg.head_cls_weight * ce.sum() / class_weight[labels].sum()

    num_total_masks = max(avg_factor, 1)
    if not pos_rows:
        zero = mask_preds.sum() * 0.0
        return loss_cls, zero, zero
    mask_targets = torch.cat(pos_gt).float()
    rows_t = torch.tensor(pos_rows, dtype=torch.long)
    mask_pred_pos = mask_preds.flatten(0, 1)[rows_t]
    coords = _uncertain_coords(
        mask_pred_pos, cfg.head_num_points, cfg.head_oversample_ratio,
        cfg.head_importance_sample_ratio)
    p = coords.shape[1]
    pred_pts = _point_sample(mask_pred_pos, coords)
    tgt_pts = _point_sample(mask_targets, coords)
    dice_v = 1 - (2 * (pred_pts.sigmoid() * tgt_pts).sum(-1) + 1.0) / (
        pred_pts.sigmoid().sum(-1) + tgt_pts.sum(-1) + 1.0)
    loss_dice = cfg.head_dice_weight * dice_v.sum() / num_total_masks
    bce = F.binary_cross_entropy_with_logits(pred_pts, tgt_pts,
                                             reduction="none")
    loss_mask = cfg.head_mask_weight * bce.sum() / (num_total_masks * p)
    return loss_cls, loss_mask, loss_dice


def total_loss(cls_list, mask_list, gt_labels, gt_masks, gt_valid, cfg):
    """Deep supervision: sum over all L+1 head outputs (ref :246-276)."""
    total = 0.0
    for cls_scores, mask_preds in zip(cls_list, mask_list):
        lc, lm, ld = reference_loss(
            cls_scores, mask_preds, gt_labels, gt_masks, gt_valid, cfg)
        total = total + lc + lm + ld
    return total
