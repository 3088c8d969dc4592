"""Fused window-MSA kernel vs the XLA WindowMSA path (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mask_bev_tpu.models.swin import (
    ShiftWindowMSA, WindowMSA, _shift_attn_mask)
from mask_bev_tpu.ops.pallas_window_msa import fused_window_msa


@pytest.mark.parametrize("with_mask", [False, True])
def test_fused_msa_matches_xla(rng, with_mask):
    b, nw, n, c, heads, win = 2, 6, 16, 32, 4, 4
    x = rng.normal(size=(b * nw, n, c)).astype(np.float32)

    msa = WindowMSA(c, heads, win)
    variables = msa.init(jax.random.PRNGKey(0), jnp.asarray(x))
    if with_mask:
        # a real shifted-window mask for a 12x8 grid of win 4, shift 2
        mask = jnp.asarray(_shift_attn_mask(12, 8, win, 2))  # (6, 16, 16)
    else:
        mask = None
    expect = msa.apply(variables, jnp.asarray(x), mask)

    p = variables["params"]
    bias = msa.apply(variables, n, method=WindowMSA.rel_bias)[None]
    bias = jnp.broadcast_to(bias, (nw, heads, n, n))
    if mask is not None:
        bias = bias + mask[:, None]
    got = fused_window_msa(
        jnp.asarray(x).reshape(b, nw, n, c), bias,
        p["qkv"]["kernel"], p["qkv"]["bias"],
        p["proj"]["kernel"], p["proj"]["bias"],
        num_heads=heads, group=4, interpret=True)

    # interpret mode emulates the MXU's default bf16-pass precision, so
    # agreement is at bf16 resolution (the production path is bf16 anyway)
    np.testing.assert_allclose(
        np.asarray(got).reshape(b * nw, n, c), np.asarray(expect),
        rtol=2e-2, atol=3e-2)


def test_shift_window_msa_fused_flag_off_matches(rng):
    """use_pallas=False path is the XLA reference; flag wiring must not
    change numerics when fusion is off."""
    b, h, w, c, heads, win = 1, 8, 8, 16, 2, 4
    x = rng.normal(size=(b, h * w, c)).astype(np.float32)
    m = ShiftWindowMSA(c, heads, win, shift=2, use_pallas=False)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), (h, w), train=False)
    out = m.apply(v, jnp.asarray(x), (h, w), train=False)
    out2 = m.apply(v, jnp.asarray(x), (h, w), train=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-6)
