"""Equivalence of the fully fused Swin-block kernel with the XLA path.

Runs the whole SwinTransformer in interpret mode (CPU) with
``use_pallas_block`` on and compares against the plain XLA path on the same
params — covering roll chaining across shifted/unshifted blocks, padded
rectangular grids, shift-region masks, and the stage-end un-roll.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mask_bev_tpu.models.swin import SwinTransformer


def _close(got, want, atol=3e-2):
    """Interpret mode emulates the MXU's default bf16-pass precision, so
    per-element agreement is at bf16 resolution (~3e-3/block, compounding
    over blocks); a data-movement bug would blow up the MEAN error by
    orders of magnitude, so bound it tightly too."""
    g, w = np.asarray(got, np.float32), np.asarray(want, np.float32)
    np.testing.assert_allclose(g, w, rtol=0, atol=atol)
    assert np.abs(g - w).mean() < atol / 3


def _mk(window, depths=(2, 2), heads=(4, 8), embed=32, hw=(33, 26), seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, hw[0] * 4, hw[1] * 4, 3)),
                    jnp.float32)
    ref = SwinTransformer(
        embed_dim=embed, depths=depths, num_heads=heads, window=window,
        out_indices=tuple(range(len(depths))),
        use_pallas=False, use_pallas_block=False)
    params = ref.init(jax.random.PRNGKey(seed), x, train=False)
    return x, params, ref


@pytest.mark.parametrize("window,hw", [
    (4, (9, 7)),    # rectangular, needs padding, shifts active
    (4, (8, 8)),    # exact multiple, shifts active
    (4, (4, 4)),    # window covers grid -> shift disabled (ref swin.py:180)
    (6, (10, 13)),  # odd padding both axes
])
def test_fused_matches_xla(window, hw):
    x, params, ref = _mk(window, hw=hw)
    want = ref.apply(params, x, train=False)

    fused = SwinTransformer(
        embed_dim=32, depths=(2, 2), num_heads=(4, 8), window=window,
        out_indices=(0, 1),
        use_pallas=False, use_pallas_block=True, fused_interpret=True)
    got = fused.apply(params, x, train=False)

    assert len(got) == len(want)
    for g, w in zip(got, want):
        _close(g, w)


def test_fused_matches_xla_deep_stage():
    # 6-deep stage: three shift/no-shift pairs chained through roll state
    x, params, ref = _mk(4, depths=(6,), heads=(4,), hw=(7, 9), seed=3)
    want = ref.apply(params, x, train=False)
    fused = SwinTransformer(
        embed_dim=32, depths=(6,), num_heads=(4,), window=4,
        out_indices=(0,),
        use_pallas=False, use_pallas_block=True, fused_interpret=True)
    got = fused.apply(params, x, train=False)
    _close(got[0], want[0], atol=5e-2)  # 6 blocks compound


def test_fused_bf16_close():
    x, params, ref = _mk(4, hw=(6, 6), seed=1)
    xb = x.astype(jnp.bfloat16)
    want = ref.apply(params, xb, train=False)
    fused = SwinTransformer(
        embed_dim=32, depths=(2, 2), num_heads=(4, 8), window=4,
        out_indices=(0, 1),
        use_pallas=False, use_pallas_block=True, fused_interpret=True)
    got = fused.apply(params, xb, train=False)
    for g, w in zip(got, want):
        _close(g, w, atol=8e-2)
