"""Scanned (nn.scan layer triples) decoder vs the unrolled python loop.

The two layouts store layer params differently (layers/lvl{l}_* stacked
over groups vs flat layer{i}_*); restacking the unrolled params into the
scanned layout must reproduce the outputs exactly — the scan is a pure
compile-time restructuring.
"""
import jax
import jax.numpy as jnp
import numpy as np

from mask_bev_tpu.models.mask2former import Mask2FormerDecoder


def _restack(flat_dec, num_layers, nl=3):
    """layer{i}_* params -> layers/lvl{l}_* stacked over groups."""
    groups = num_layers // nl
    layers = {}
    for lvl in range(nl):
        for kind in ("cross", "self", "norm1", "norm2", "norm3", "ffn"):
            per_g = [flat_dec[f"layer{3 * g + lvl}_{kind}"]
                     for g in range(groups)]
            layers[f"lvl{lvl}_{kind}"] = jax.tree.map(
                lambda *xs: jnp.stack(xs), *per_g)
    out = {k: v for k, v in flat_dec.items()
           if not k.startswith("layer")}
    out["layers"] = layers
    return out


def test_scanned_matches_unrolled():
    kw = dict(num_queries=7, num_classes=2, num_layers=6, feat_channels=32,
              out_channels=32, num_heads=4, ffn_dim=64, predict_height=True)
    rng = np.random.default_rng(0)
    b = 2
    mf = jnp.asarray(rng.standard_normal((b, 16, 16, 32)), jnp.float32)
    mems = [jnp.asarray(rng.standard_normal((b, h, h, 32)), jnp.float32)
            for h in (4, 8, 16)]

    flat = Mask2FormerDecoder(scan_layers=False, **kw)
    params = flat.init(jax.random.PRNGKey(0), mf, mems, train=False)["params"]
    want = flat.apply({"params": params}, mf, mems, train=False)

    scanned = Mask2FormerDecoder(scan_layers=True, **kw)
    sparams = _restack(params, kw["num_layers"])
    got = scanned.apply({"params": sparams}, mf, mems, train=False)

    # not bitwise: the scan body is compiled separately from the unrolled
    # graph, so XLA fusion/reassociation differs at float ulp level
    for g, w in ((got.cls_logits, want.cls_logits),
                 (got.mask_logits, want.mask_logits),
                 (got.height_logits, want.height_logits)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


def test_indivisible_layers_fall_back():
    kw = dict(num_queries=5, num_classes=1, num_layers=4, feat_channels=16,
              out_channels=16, num_heads=2, ffn_dim=32)
    rng = np.random.default_rng(1)
    mf = jnp.asarray(rng.standard_normal((1, 8, 8, 16)), jnp.float32)
    mems = [jnp.asarray(rng.standard_normal((1, h, h, 16)), jnp.float32)
            for h in (2, 4, 8)]
    dec = Mask2FormerDecoder(scan_layers=True, **kw)  # 4 % 3 != 0
    variables = dec.init(jax.random.PRNGKey(0), mf, mems, train=False)
    assert "layer0_cross" in variables["params"]  # unrolled tree
    out = dec.apply(variables, mf, mems, train=False)
    assert out.cls_logits.shape[0] == kw["num_layers"] + 1
