"""Torch-Swin checkpoint conversion: structural round-trip on a tiny model."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mask_bev_tpu.models.convert import _resize_bias_table, convert_torch_swin
from mask_bev_tpu.models.swin import SwinTransformer


def _tiny_swin():
    return SwinTransformer(embed_dim=16, depths=(1, 1), num_heads=(2, 2),
                           window=3, out_indices=(0, 1))


def _torch_style_state_dict(rng, window=3):
    """mmdet-style key layout with numpy values."""
    sd = {}
    sd["patch_embed.projection.weight"] = rng.normal(size=(16, 4, 4, 4)).astype(np.float32)
    sd["patch_embed.projection.bias"] = rng.normal(size=(16,)).astype(np.float32)
    sd["patch_embed.norm.weight"] = np.ones(16, np.float32)
    sd["patch_embed.norm.bias"] = np.zeros(16, np.float32)
    for i, dim in enumerate((16, 32)):
        b = f"stages.{i}.blocks.0"
        heads = 2
        sd[f"{b}.norm1.weight"] = np.ones(dim, np.float32)
        sd[f"{b}.norm1.bias"] = np.zeros(dim, np.float32)
        sd[f"{b}.norm2.weight"] = np.ones(dim, np.float32)
        sd[f"{b}.norm2.bias"] = np.zeros(dim, np.float32)
        sd[f"{b}.attn.w_msa.relative_position_bias_table"] = rng.normal(
            size=((2 * window - 1) ** 2, heads)).astype(np.float32)
        sd[f"{b}.attn.w_msa.qkv.weight"] = rng.normal(size=(3 * dim, dim)).astype(np.float32)
        sd[f"{b}.attn.w_msa.qkv.bias"] = np.zeros(3 * dim, np.float32)
        sd[f"{b}.attn.w_msa.proj.weight"] = rng.normal(size=(dim, dim)).astype(np.float32)
        sd[f"{b}.attn.w_msa.proj.bias"] = np.zeros(dim, np.float32)
        sd[f"{b}.ffn.layers.0.0.weight"] = rng.normal(size=(4 * dim, dim)).astype(np.float32)
        sd[f"{b}.ffn.layers.0.0.bias"] = np.zeros(4 * dim, np.float32)
        sd[f"{b}.ffn.layers.1.weight"] = rng.normal(size=(dim, 4 * dim)).astype(np.float32)
        sd[f"{b}.ffn.layers.1.bias"] = np.zeros(dim, np.float32)
    sd["stages.0.downsample.norm.weight"] = np.ones(64, np.float32)
    sd["stages.0.downsample.norm.bias"] = np.zeros(64, np.float32)
    sd["stages.0.downsample.reduction.weight"] = rng.normal(size=(32, 64)).astype(np.float32)
    sd["norm0.weight"] = np.ones(16, np.float32)
    sd["norm0.bias"] = np.zeros(16, np.float32)
    sd["norm1.weight"] = np.ones(32, np.float32)
    sd["norm1.bias"] = np.zeros(32, np.float32)
    return sd


def test_convert_overwrites_and_applies(rng):
    m = _tiny_swin()
    x = jnp.zeros((1, 24, 24, 4))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    sd = _torch_style_state_dict(rng)
    converted = convert_torch_swin(sd, {"backbone": variables["params"]})

    bb = converted["backbone"]
    # qkv weights transposed into (in, out)
    np.testing.assert_allclose(
        bb["stage0_block0"]["attn"]["w_msa"]["qkv"]["kernel"],
        sd["stages.0.blocks.0.attn.w_msa.qkv.weight"].T, rtol=1e-6)
    # conv kernel reordered to HWIO
    np.testing.assert_allclose(
        bb["patch_embed"]["kernel"],
        sd["patch_embed.projection.weight"].transpose(2, 3, 1, 0), rtol=1e-6)
    # converted params still run
    outs = m.apply({"params": bb}, x, train=False)
    assert outs[0].shape == (1, 6, 6, 16)
    assert np.isfinite(np.asarray(outs[-1])).all()


def test_bias_table_resize():
    t = np.arange(25.0).reshape(25, 1)  # window 3 -> (2*3-1)^2
    out = _resize_bias_table(t, 81)  # window 5
    assert out.shape == (81, 1)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(_resize_bias_table(t, 25), t)


def test_convert_scanned_stage_matches_unrolled(rng):
    """Converting into the nn.scan'd (stacked) stage layout must place each
    torch block at the right (group, half) slot: both layouts, fed the same
    state_dict, must produce identical outputs."""
    kw = dict(embed_dim=16, depths=(4,), num_heads=(2,), window=3,
              out_indices=(0,), use_pallas=False, use_pallas_block=False)
    sd = {}
    for d in range(4):
        b = f"stages.0.blocks.{d}"
        dim = 16
        for nm in ("norm1", "norm2"):
            sd[f"{b}.{nm}.weight"] = rng.normal(size=(dim,)).astype(np.float32)
            sd[f"{b}.{nm}.bias"] = rng.normal(size=(dim,)).astype(np.float32)
        sd[f"{b}.attn.w_msa.relative_position_bias_table"] = rng.normal(
            size=(25, 2)).astype(np.float32)
        sd[f"{b}.attn.w_msa.qkv.weight"] = rng.normal(
            size=(3 * dim, dim)).astype(np.float32)
        sd[f"{b}.attn.w_msa.qkv.bias"] = rng.normal(
            size=(3 * dim,)).astype(np.float32)
        sd[f"{b}.attn.w_msa.proj.weight"] = rng.normal(
            size=(dim, dim)).astype(np.float32)
        sd[f"{b}.attn.w_msa.proj.bias"] = rng.normal(
            size=(dim,)).astype(np.float32)
        sd[f"{b}.ffn.layers.0.0.weight"] = rng.normal(
            size=(4 * dim, dim)).astype(np.float32)
        sd[f"{b}.ffn.layers.0.0.bias"] = rng.normal(
            size=(4 * dim,)).astype(np.float32)
        sd[f"{b}.ffn.layers.1.weight"] = rng.normal(
            size=(dim, 4 * dim)).astype(np.float32)
        sd[f"{b}.ffn.layers.1.bias"] = rng.normal(
            size=(dim,)).astype(np.float32)

    x = jnp.asarray(rng.normal(size=(1, 24, 24, 4)), jnp.float32)
    outs = {}
    for scan in (False, True):
        m = SwinTransformer(scan_pairs=scan, **kw)
        variables = m.init(jax.random.PRNGKey(0), x, train=False)
        conv = convert_torch_swin(sd, {"backbone": variables["params"]})
        outs[scan] = np.asarray(
            m.apply({"params": conv["backbone"]}, x, train=False)[0])
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-5, atol=1e-5)
