"""Pixel decoder: 4-scale backbone pyramid -> mask features + decoder memories.

Contract matches the reference's ``MSDeformAttnPixelDecoder`` (configured at
reference ``mask_bev_panoptic_head.py:120-146``): consumes the Swin pyramid
[C, 2C, 4C, 8C] at strides /4../32 and produces

  * ``mask_features``: (B, out_ch, H/4, W/4) — the per-pixel embedding the
    query decoder dots against;
  * three ``memories`` at /8, /16, /32 with ``feat_ch`` channels each, plus
    their sine positional encodings and per-level embeddings.

TPU-native deviation (documented; SURVEY.md §2.2 N4): multi-scale deformable
attention has no TPU kernel and its gather-heavy sampling maps poorly onto
the MXU. We replace the 6-layer deformable-attention encoder with a conv
FPN (lateral 1x1 + GN, top-down nearest upsample + add, 3x3 output convs)
and optional per-level shifted-window attention refinement layers
(``num_attn_layers``). Validated by end-metric parity, not activation parity.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mask_bev_tpu.models.swin import SwinBlock


class PixelDecoder(nn.Module):
    feat_channels: int = 256
    out_channels: int = 256
    num_attn_layers: int = 0  # window-attention refinement on /8,/16,/32
    attn_heads: int = 8
    attn_window: int = 10

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = True):
        # feats: [/4, /8, /16, /32], each (B, Hi, Wi, Ci) [NHWC]
        assert len(feats) == 4
        c = self.feat_channels
        laterals = []
        for i, x in enumerate(feats):
            y = nn.Conv(c, (1, 1), name=f"lateral{i}")(x)
            y = nn.GroupNorm(num_groups=32, name=f"lateral_gn{i}")(y)
            laterals.append(y)

        # optional attention refinement on the three coarse levels (the levels
        # the reference runs deformable attention over)
        for i in range(1, 4):
            y = laterals[i]
            b, h, w, _ = y.shape
            t = y.reshape(b, h * w, c)
            for l in range(self.num_attn_layers):
                t = SwinBlock(
                    c, self.attn_heads, self.attn_window,
                    shift=(l % 2 == 1), name=f"refine{i}_{l}",
                )(t, (h, w))
            laterals[i] = t.reshape(b, h, w, c)

        # top-down pathway
        path = [None] * 4
        path[3] = laterals[3]
        for i in (2, 1, 0):
            up = jax.image.resize(
                path[i + 1],
                (path[i + 1].shape[0], laterals[i].shape[1], laterals[i].shape[2], c),
                method="nearest",
            )
            path[i] = laterals[i] + up

        outs = []
        for i in range(4):
            y = nn.Conv(c, (3, 3), name=f"output{i}")(path[i])
            y = nn.GroupNorm(num_groups=32, name=f"output_gn{i}")(y)
            y = nn.relu(y)
            outs.append(y)

        # mask_features (B, H/4, W/4, C); memories coarse->fine /32, /16, /8
        # (mmdet decoder cycles levels i%3 starting at /32; reference
        # mask2former_head.py:500-556). All NHWC.
        mask_features = nn.Conv(self.out_channels, (3, 3), name="mask_feature")(outs[0])
        memories = [outs[i] for i in (3, 2, 1)]
        return mask_features, memories
