"""Scanned (nn.scan block pairs) deep Swin stages vs the unrolled loop."""
import jax
import jax.numpy as jnp
import numpy as np

from mask_bev_tpu.models.swin import SwinTransformer


def _restack(params, stage, depth):
    """stage{i}_block{d} params -> stage{i}_pairs/block{d%2} stacked."""
    out = {k: v for k, v in params.items()
           if not k.startswith(f"stage{stage}_block")}
    pairs = {}
    for half in (0, 1):
        per_g = [params[f"stage{stage}_block{2 * g + half}"]
                 for g in range(depth // 2)]
        pairs[f"block{half}"] = jax.tree.map(
            lambda *xs: jnp.stack(xs), *per_g)
    out[f"stage{stage}_pairs"] = pairs
    return out


def test_scanned_pairs_match_unrolled():
    kw = dict(embed_dim=32, depths=(2, 4), num_heads=(4, 8), window=4,
              out_indices=(0, 1), use_pallas=False, use_pallas_block=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 36, 28, 3)), jnp.float32)

    flat = SwinTransformer(scan_pairs=False, **kw)
    params = flat.init(jax.random.PRNGKey(0), x, train=False)["params"]
    want = flat.apply({"params": params}, x, train=False)

    scanned = SwinTransformer(scan_pairs=True, **kw)
    sparams = _restack(params, stage=1, depth=4)
    got = scanned.apply({"params": sparams}, x, train=False)

    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


def test_scanned_pairs_train_runs():
    # drop-path rates ride the scan as traced inputs; train path must run
    kw = dict(embed_dim=16, depths=(4,), num_heads=(2,), window=4,
              out_indices=(0,), drop_path_rate=0.2,
              use_pallas=False, use_pallas_block=False)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    m = SwinTransformer(scan_pairs=True, **kw)
    variables = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=True)
    assert "stage0_pairs" in variables["params"]
    out = m.apply(variables, x, train=True,
                  rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(out[0])).all()


def test_scanned_pairs_train_bf16_dtype_stable():
    """bf16 scan carry: block outputs must keep the input dtype.

    Regression: drop-path scaled by a traced f32 `keep`, upcasting the
    bf16 residual to f32 and breaking the nn.scan carry contract
    (measurements/r3/train_time.log).
    """
    kw = dict(embed_dim=16, depths=(4,), num_heads=(2,), window=4,
              out_indices=(0,), drop_path_rate=0.2,
              use_pallas=False, use_pallas_block=False)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.bfloat16)
    m = SwinTransformer(scan_pairs=True, **kw)
    variables = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=True)
    bf16_vars = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, variables)
    out = m.apply(bf16_vars, x, train=True,
                  rngs={"dropout": jax.random.PRNGKey(2)})
    assert out[0].dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out[0], np.float32)).all()


def test_unroll_eval_matches_scanned_fused():
    """The fused-eval unroll (chained kernels over the stacked stage params,
    no lax.while step / uniform-carry rolls) must reproduce the scanned
    fused path EXACTLY: same token partition per band, same math, only the
    roll-state bookkeeping differs."""
    import jax.numpy as jnp

    kw = dict(embed_dim=32, depths=(4,), num_heads=(4,), window=4,
              out_indices=(0,), use_pallas=False, use_pallas_block=True,
              fused_interpret=True)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 9 * 4, 7 * 4, 3)), jnp.float32)
    scanned = SwinTransformer(unroll_eval=False, **kw)
    params = scanned.init(jax.random.PRNGKey(0), x, train=False)
    want = scanned.apply(params, x, train=False)
    unrolled = SwinTransformer(unroll_eval=True, **kw)
    got = unrolled.apply(params, x, train=False)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
