"""Fused decoder-layer kernel vs the XLA final_only path (interpret)."""
import jax
import jax.numpy as jnp
import numpy as np

from mask_bev_tpu.models.mask2former import Mask2FormerDecoder


def _mk(seed=0, b=2, hw=16, c=32, heads=4, layers=3):
    rng = np.random.default_rng(seed)
    dec_kw = dict(num_queries=6, num_classes=1, num_layers=layers,
                  feat_channels=c, out_channels=c, num_heads=heads,
                  ffn_dim=64, scan_layers=True)
    mask_features = jnp.asarray(
        rng.normal(size=(b, hw, hw, c)).astype(np.float32))
    memories = [jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
                for (h, w) in [(hw // 2, hw // 2), (hw // 4, hw // 4),
                               (hw // 8, hw // 8)]]
    return dec_kw, mask_features, memories


def test_fused_layer_matches_xla_final_only():
    dec_kw, mask_features, memories = _mk()
    xla = Mask2FormerDecoder(**dec_kw)
    v = xla.init(jax.random.PRNGKey(0), mask_features, memories, train=False)
    want = xla.apply(v, mask_features, memories, train=False,
                     final_only=True)
    fused = Mask2FormerDecoder(use_pallas=True, pallas_interpret=True,
                               **dec_kw)
    got = fused.apply(v, mask_features, memories, train=False,
                      final_only=True)
    np.testing.assert_allclose(
        np.asarray(got.cls_logits[-1]), np.asarray(want.cls_logits[-1]),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(got.mask_logits[-1]), np.asarray(want.mask_logits[-1]),
        rtol=2e-4, atol=2e-4)


def test_fused_layer_nine_layers_bf16():
    dec_kw, mask_features, memories = _mk(seed=1, layers=9)
    mask_features = mask_features.astype(jnp.bfloat16)
    memories = [m.astype(jnp.bfloat16) for m in memories]
    xla = Mask2FormerDecoder(**dec_kw)
    v = xla.init(jax.random.PRNGKey(1), mask_features, memories, train=False)
    vb = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, v)
    want = xla.apply(vb, mask_features, memories, train=False,
                     final_only=True)
    fused = Mask2FormerDecoder(use_pallas=True, pallas_interpret=True,
                               **dec_kw)
    got = fused.apply(vb, mask_features, memories, train=False,
                      final_only=True)
    g = np.asarray(got.mask_logits[-1], np.float32)
    w = np.asarray(want.mask_logits[-1], np.float32)
    scale = np.abs(w).max() + 1e-6
    assert np.abs(g - w).max() / scale < 0.08, np.abs(g - w).max()
