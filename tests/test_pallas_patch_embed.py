"""Fused canvas->patch-embed->LN kernel vs the XLA conv path (interpret)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mask_bev_tpu.ops.pallas_patch_embed import fused_patch_embed


def _flat_from_nhwc(x):
    """(B, H, W, C) -> batch-minor flat (H*W, B*C) (canvas kernel layout)."""
    b, h, w, c = x.shape
    return jnp.transpose(x, (1, 2, 0, 3)).reshape(h * w, b * c)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_patch_embed_matches_conv_ln(rng, dtype):
    b, h, w, c, e, p = 2, 24, 16, 8, 12, 4
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype)
    kern = jnp.asarray(0.1 * rng.standard_normal((p, p, c, e)), dtype)
    bias = jnp.asarray(0.1 * rng.standard_normal((e,)), dtype)
    ls = jnp.asarray(1.0 + 0.1 * rng.standard_normal((e,)), dtype)
    lb = jnp.asarray(0.1 * rng.standard_normal((e,)), dtype)

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Conv(e, (p, p), strides=(p, p), padding="VALID",
                        name="patch_embed")(x)
            y = y.reshape(b, (h // p) * (w // p), e)
            return nn.LayerNorm(name="patch_norm")(y)

    params = {"params": {"patch_embed": {"kernel": kern, "bias": bias},
                         "patch_norm": {"scale": ls, "bias": lb}}}
    want = np.asarray(Ref().apply(params, x), np.float32)

    got = fused_patch_embed(
        _flat_from_nhwc(x), kern, bias, ls, lb,
        h=h, w=w, bsz=b, patch=p, out_dtype=dtype, interpret=True)
    got = np.asarray(got, np.float32)
    assert got.shape == want.shape
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def test_swin_flat_canvas_path_matches_conv_path(rng):
    """SwinTransformer(canvas_flat=...) (the MaskBev fused wiring) must
    reproduce the conv+LN path through the whole backbone."""
    from mask_bev_tpu.models.swin import SwinTransformer

    b, h, w, c = 2, 24, 16, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    kw = dict(embed_dim=32, depths=(2,), num_heads=(4,), window=4,
              patch_size=4, out_indices=(0,), use_pallas=False,
              use_pallas_block=False)
    ref = SwinTransformer(**kw)
    params = ref.init(jax.random.PRNGKey(0), x, train=False)
    want = ref.apply(params, x, train=False)

    fused = SwinTransformer(fused_interpret=True, **kw)
    got = fused.apply(params, None, train=False,
                      canvas_flat=(_flat_from_nhwc(x), (h, w, b)))
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=2e-5, atol=2e-5)
