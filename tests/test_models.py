"""Hermetic shape-contract tests for the model stack.

Mirrors the reference's random-tensor tests
(mask_bev_test/models/*/test_point_mask_backbone.py:24-33 — incl. the
rectangular-grid pyramid [35,18,9,5]x[40,20,10,5], and
test_point_mask_panoptic_head.py:29-57) without datasets.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mask_bev_tpu.config import tiny_test_config
from mask_bev_tpu.models.swin import SwinTransformer
from mask_bev_tpu.models.pixel_decoder import PixelDecoder
from mask_bev_tpu.models.mask2former import Mask2FormerDecoder
from mask_bev_tpu.models.maskbev import MaskBev


def test_swin_rectangular_pyramid():
    # reference kitti backbone test: 140x160 input -> [35,18,9,5]x[40,20,10,5]
    # (NHWC layout end-to-end)
    m = SwinTransformer(embed_dim=24, depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2),
                        window=5)
    x = jnp.zeros((1, 140, 160, 8))
    params = m.init(jax.random.PRNGKey(0), x, train=False)
    outs = m.apply(params, x, train=False)
    shapes = [o.shape for o in outs]
    assert shapes == [
        (1, 35, 40, 24), (1, 18, 20, 48), (1, 9, 10, 96), (1, 5, 5, 192)]


def test_pixel_decoder_contract():
    pd = PixelDecoder(feat_channels=64, out_channels=64)
    feats = [jnp.zeros((2, 20, 20, 48)), jnp.zeros((2, 10, 10, 96)),
             jnp.zeros((2, 5, 5, 192)), jnp.zeros((2, 3, 3, 384))]
    params = pd.init(jax.random.PRNGKey(0), feats)
    mask_features, memories = pd.apply(params, feats)
    assert mask_features.shape == (2, 20, 20, 64)
    assert [m.shape for m in memories] == [
        (2, 3, 3, 64), (2, 5, 5, 64), (2, 10, 10, 64)]


def test_decoder_outputs_stacked():
    dec = Mask2FormerDecoder(num_queries=8, num_classes=1, num_layers=3,
                             feat_channels=64, out_channels=64, ffn_dim=128)
    mask_features = jnp.zeros((2, 20, 20, 64))
    memories = [jnp.zeros((2, 3, 3, 64)), jnp.zeros((2, 5, 5, 64)),
                jnp.zeros((2, 10, 10, 64))]
    params = dec.init(jax.random.PRNGKey(0), mask_features, memories)
    out = dec.apply(params, mask_features, memories)
    assert out.cls_logits.shape == (4, 2, 8, 2)  # L+1, B, Q, K+1
    assert out.mask_logits.shape == (4, 2, 8, 20, 20)
    assert out.height_logits is None


def test_full_model_forward(rng):
    cfg = tiny_test_config()
    model = MaskBev(cfg)
    pts = rng.uniform(-9, 9, size=(2, 512, 4)).astype(np.float32)
    mask = np.ones((2, 512), bool)
    variables = model.init(jax.random.PRNGKey(0), pts, mask, train=False)
    out = model.apply(variables, pts, mask, train=False)
    L = cfg.num_decoder_outputs
    h4 = cfg.grid_hw[0] // 4
    assert out.cls_logits.shape == (L, 2, cfg.num_queries, cfg.head_num_classes + 1)
    assert out.mask_logits.shape == (L, 2, cfg.num_queries, h4, h4)
    assert np.isfinite(np.asarray(out.cls_logits)).all()
    assert np.isfinite(np.asarray(out.mask_logits)).all()


def test_model_train_mode_mutates_batch_stats(rng):
    cfg = tiny_test_config()
    model = MaskBev(cfg)
    pts = rng.uniform(-9, 9, size=(1, 256, 4)).astype(np.float32)
    mask = np.ones((1, 256), bool)
    variables = model.init(jax.random.PRNGKey(0), pts, mask, train=True)
    assert "batch_stats" in variables
    out, updates = model.apply(
        variables, pts, mask, train=True, mutable=["batch_stats"])
    assert "batch_stats" in updates
