"""Equivalence of the fused whole-stack decoder kernel with the XLA
final_only path (interpret mode; compiled on TPU by the perf scripts)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mask_bev_tpu.models.mask2former import Mask2FormerDecoder


def _setup(num_layers=9, q=6, c=32, seed=3, predict_height=False):
    dec = Mask2FormerDecoder(
        num_queries=q, num_classes=1, num_layers=num_layers,
        feat_channels=c, out_channels=c, num_heads=4, ffn_dim=64,
        scan_layers=True, predict_height=predict_height)
    fused = Mask2FormerDecoder(
        num_queries=q, num_classes=1, num_layers=num_layers,
        feat_channels=c, out_channels=c, num_heads=4, ffn_dim=64,
        scan_layers=True, predict_height=predict_height,
        use_pallas=True, pallas_interpret=True)
    rng = np.random.default_rng(seed)
    b = 2
    mask_features = jnp.asarray(
        rng.normal(size=(b, 16, 16, c)).astype(np.float32))
    memories = [jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
                for (h, w) in [(8, 8), (4, 4), (2, 2)]]
    v = dec.init(jax.random.PRNGKey(seed), mask_features, memories,
                 train=False)
    return dec, fused, v, mask_features, memories


@pytest.mark.parametrize("num_layers", [3, 9])
def test_fused_stack_matches_xla(num_layers):
    dec, fused, v, mf, mems = _setup(num_layers=num_layers)
    want = dec.apply(v, mf, mems, train=False, final_only=True)
    got = fused.apply(v, mf, mems, train=False, final_only=True)
    assert got.cls_logits.shape == want.cls_logits.shape
    np.testing.assert_allclose(
        np.asarray(got.cls_logits), np.asarray(want.cls_logits),
        rtol=0, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(got.mask_logits), np.asarray(want.mask_logits),
        rtol=0, atol=2e-3)


def test_fused_stack_matches_full_decoder():
    """Against the FULL per-layer reference path (not just final_only)."""
    dec, fused, v, mf, mems = _setup(num_layers=9, seed=5)
    full = dec.apply(v, mf, mems, train=False)
    got = fused.apply(v, mf, mems, train=False, final_only=True)
    np.testing.assert_allclose(
        np.asarray(got.cls_logits[-1]), np.asarray(full.cls_logits[-1]),
        rtol=0, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(got.mask_logits[-1]), np.asarray(full.mask_logits[-1]),
        rtol=0, atol=2e-3)


def test_fused_stack_bf16():
    dec, fused, v, mf, mems = _setup(num_layers=3, seed=7)
    vb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), v)
    mfb = mf.astype(jnp.bfloat16)
    memsb = [m.astype(jnp.bfloat16) for m in mems]
    want = dec.apply(vb, mfb, memsb, train=False, final_only=True)
    got = fused.apply(vb, mfb, memsb, train=False, final_only=True)
    w = np.asarray(want.mask_logits, np.float32)
    g = np.asarray(got.mask_logits, np.float32)
    assert np.abs(g - w).mean() < 3e-2 * (np.abs(w).mean() + 1)


def test_fused_stack_predict_height():
    dec, fused, v, mf, mems = _setup(num_layers=3, seed=9,
                                     predict_height=True)
    want = dec.apply(v, mf, mems, train=False, final_only=True)
    got = fused.apply(v, mf, mems, train=False, final_only=True)
    np.testing.assert_allclose(
        np.asarray(got.height_logits), np.asarray(want.height_logits),
        rtol=0, atol=2e-3)
