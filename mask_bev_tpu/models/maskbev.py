"""Full MaskBEV model: raw padded scans -> per-layer (cls, mask[, height]) logits.

The TPU equivalent of the reference task module's model stack
(``mask_bev_module.py:34-100,174-187``): encoder -> backbone -> panoptic head,
with the same three-phase public API (``forward_encode`` / ``forward_backbone``
/ ``pred_masks``) exposed via the ``phase`` argument so figure/inference
tooling can tap intermediate features.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mask_bev_tpu.config import MaskBevConfig
from mask_bev_tpu.models.encoder import MaskBevEncoder
from mask_bev_tpu.models.mask2former import DecoderOutputs, Mask2FormerDecoder
from mask_bev_tpu.models.pixel_decoder import PixelDecoder
from mask_bev_tpu.models.swin import SwinTransformer


class MaskBev(nn.Module):
    """config-driven assembly of the full detection model."""

    cfg: MaskBevConfig

    def setup(self):
        c = self.cfg
        self.encoder = MaskBevEncoder(
            x_range=tuple(c.x_range), y_range=tuple(c.y_range),
            z_range=tuple(c.z_range), voxel_size=c.voxel_size,
            feat_channels=tuple(c.encoder_feat_channels),
            max_points_per_pillar=c.max_num_points,
            max_pillars=c.max_num_pillars,
            point_dim=c.pc_point_dim,
            encoding_type=c.encoder_encoding_type,
            fourier_enc_group=c.encoder_fourier_enc_group,
            pseudo_image_norm=c.pseudo_image_norm,
            use_pallas=c.use_pallas_encoder,
        )
        strides = tuple(c.backbone_strides)
        if strides[1:] != (2, 2, 2):
            raise ValueError(
                "backbone_strides[1:] must be (2, 2, 2): patch merging halves "
                f"the grid per stage (got {strides}); only the patch-embed "
                "stride strides[0] is configurable, as in every reference "
                "config (mask_bev_backbone.py:50)")
        self.backbone = SwinTransformer(
            embed_dim=c.backbone_embed_dim,
            depths=tuple(c.backbone_depths),
            num_heads=tuple(c.backbone_num_heads),
            window=c.backbone_window_size,
            patch_size=c.backbone_patch_size,
            patch_stride=strides[0],
            mlp_ratio=c.backbone_mlp_ratio,
            drop_path_rate=c.backbone_drop_path_rate,
            use_abs_pos_embed=c.backbone_use_abs_emb,
            swap_dims=c.backbone_swap_dims,
            use_pallas=c.use_pallas_attention,
            use_pallas_block=c.use_pallas_backbone,
            band_layout=c.backbone_band_layout,
            quantize_int8=(c.backbone_quantize == "int8"),
            remat=c.remat_backbone,
            unroll_eval=c.backbone_unroll_eval,
        )
        self.pixel_decoder = PixelDecoder(
            feat_channels=c.head_feat_channels,
            out_channels=c.head_out_channels,
            num_attn_layers=c.pixel_decoder_num_attn_layers,
        )
        self.decoder = Mask2FormerDecoder(
            num_queries=c.num_queries,
            num_classes=c.head_num_classes,
            num_layers=c.head_num_decoder_layers,
            feat_channels=c.head_feat_channels,
            out_channels=c.head_out_channels,
            num_heads=c.head_num_attn_heads,
            ffn_dim=c.head_ffn_dim,
            predict_height=c.predict_height,
            num_height_bins=c.head_num_height_bins,
            use_pallas=c.use_pallas_head,
        )

    def _flat_embed_ok(self, train: bool) -> bool:
        """Fused canvas->patch-embed->LN path (ops/pallas_patch_embed):
        needs the encoder's slot fused path (batch-minor flat canvas), a
        stride==patch no-padding patch embed, and no abs pos embed."""
        c = self.cfg
        h, w = self.encoder.grid_hw
        p = c.backbone_patch_size
        return (c.fuse_patch_embed and not train
                and not self.is_initializing()
                and self.encoder.uses_slot_path(train)
                and not c.backbone_use_abs_emb
                and tuple(c.backbone_strides)[0] == p
                and h % p == 0 and w % p == 0)

    def __call__(self, points, point_mask, train: bool = True,
                 final_only: bool = False) -> DecoderOutputs:
        """``final_only=True`` (inference): only the final head pass is
        returned (leading axis 1, so ``[-1]`` indexing still works) and the
        intermediate layers skip their full-resolution mask logits — exact
        by linearity of the bilinear resize (see Mask2FormerDecoder)."""
        if self._flat_embed_ok(train):
            h, w = self.encoder.grid_hw
            flat = self.encoder(points, point_mask, train=train, flat=True)
            feats = self.backbone(
                None, train=train,
                canvas_flat=(flat, (h, w, points.shape[0])))
        else:
            x = self.encoder(points, point_mask, train=train)
            feats = self.backbone(x, train=train)
        mask_features, memories = self.pixel_decoder(feats, train=train)
        return self.decoder(mask_features, memories, train=train,
                            final_only=final_only)

    # --- reference-parity phase API (mask_bev_module.py:180-187) ---
    def forward_encode(self, points, point_mask, train: bool = False):
        return self.encoder(points, point_mask, train=train)

    def forward_backbone(self, pseudo_image, train: bool = False):
        return self.backbone(pseudo_image, train=train)

    def pred_masks(self, feats: Sequence[jax.Array], train: bool = False,
                   final_only: bool = False):
        mask_features, memories = self.pixel_decoder(feats, train=train)
        return self.decoder(mask_features, memories, train=train,
                            final_only=final_only)
