"""Fused token LayerNorm kernel vs flax nn.LayerNorm (interpret mode)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mask_bev_tpu.ops.pallas_layer_norm import fused_layer_norm


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-5),
                                       (jnp.bfloat16, 2e-2)])
@pytest.mark.parametrize("shape", [(2, 700, 48), (3, 11, 13, 32), (5, 24)])
def test_fused_layer_norm_matches_flax(rng, dtype, tol, shape):
    x = jnp.asarray(rng.standard_normal(shape), dtype)
    c = shape[-1]
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal((c,)), dtype)
    bias = jnp.asarray(0.1 * rng.standard_normal((c,)), dtype)
    ln = nn.LayerNorm()
    want = np.asarray(
        ln.apply({"params": {"scale": scale, "bias": bias}}, x), np.float32)
    got = np.asarray(
        fused_layer_norm(x, scale, bias, block_rows=256, interpret=True),
        np.float32)
    assert got.shape == want.shape and got.dtype == want.dtype
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)
