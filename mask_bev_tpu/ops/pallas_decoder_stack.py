"""Fused Mask2Former decoder STACK (final_only inference path).

ONE Pallas kernel runs all ``num_layers`` decoder layers per batch element.
The XLA head executes ~30 separate ops per layer on (45, 256)-sized tensors
— per-op fixed costs dominate and the measured head time (6.1 ms/b8, r4) is
~25x its FLOP floor (~48 GF/b8). The round-3 per-layer kernel
(``pallas_decoder_layer``, deleted) LOST its A/B against XLA because each of
its 9 launches re-DMAed the level memory, positional encoding and resized
mask features from HBM; this kernel instead:

  * keeps the query state (Q, C) resident in VMEM scratch across ALL layers
    (grid = (B, groups), one level-triple of layers per grid step, carry in
    scratch — never touches HBM between layers);
  * holds the 3 level memories / PEs / resized features as revisit-cached
    per-batch blocks (fetched once per batch element, reused by all visits);
  * ships every layer's weights as stacked (L, ...) VMEM-resident operands,
    indexed dynamically by the layer counter (fetched once per call).

Semantics mirror ``models/mask2former.py`` exactly (reference
``mask2former_head.py:428-562``): additive -1e9 bias where
``sigmoid(m) < 0.5`` (== ``m < 0``), all-blocked query rows cleared,
post-norm residual order cross -> self -> FFN, mask embedding from the
shared decoder-norm + 3-layer MLP. Equivalence is tested in interpret mode
(``tests/test_pallas_decoder_stack.py``).
"""
from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _ln(x32, scale, bias):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + 1e-6) * scale + bias


def _dot(a, b, bias=None):
    y = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y if bias is None else y + bias


def _attend(q, k, v, wo, bo, *, heads: int, bias, dtype):
    """Per-head attention of projected q/k/v (already biased projections)."""
    c = q.shape[-1]
    hd = c // heads
    scale = hd ** -0.5
    cols = []
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        attn = jax.lax.dot_general(
            (q[:, sl] * scale).astype(dtype), k[:, sl].astype(dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if bias is not None:
            attn = attn + bias
        attn = jax.nn.softmax(attn, axis=-1)
        cols.append(jax.lax.dot_general(
            attn.astype(dtype), v[:, sl].astype(dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    o = jnp.concatenate(cols, axis=-1).astype(dtype)
    return _dot(o, wo, bo)


def _stack_kernel(*refs, heads: int, nl: int, groups: int, dtype):
    (out0_ref, emb0_ref, qpos_ref) = refs[:3]
    mem_refs = refs[3:3 + nl]
    pe_refs = refs[3 + nl:3 + 2 * nl]
    feat_refs = refs[3 + 2 * nl:3 + 3 * nl]
    (wq, bq, wk, bk, wv, bv, wo, bo,
     sqkv, sbqkv, sbv, so, sbo, n1s, n1b, n2s, n2b, n3s, n3b,
     f1, fb1, f2, fb2,
     dns, dnb, m1, mb1, m2, mb2, m3, mb3) = refs[3 + 3 * nl:-3]
    out_ref, cx, ce = refs[-3], refs[-2], refs[-1]

    g = pl.program_id(1)
    f32 = jnp.float32

    @pl.when(g == 0)
    def _():
        cx[...] = out0_ref[0].astype(f32)
        ce[...] = emb0_ref[0].astype(f32)

    x32 = cx[...]                          # (Q, C) f32 carry
    emb = ce[...]                          # (Q, Co) f32
    qpos = qpos_ref[...].astype(f32)

    for lvl in range(nl):
        li = g * nl + lvl                  # dynamic layer index
        mem = mem_refs[lvl][0]             # (T, C) dtype
        pe = pe_refs[lvl][...]
        feat = feat_refs[lvl][0]           # (T, Co) f32

        # masked cross-attention bias: sigmoid(m) < 0.5 <=> m < 0;
        # all-blocked query rows cleared (ref mask2former_head.py:460-470)
        m = jax.lax.dot_general(emb, feat.astype(f32),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)
        blocked = m < 0.0
        all_blocked = jnp.all(blocked, axis=-1, keepdims=True)
        bias = jnp.where(blocked & ~all_blocked, _NEG, 0.0)

        # LN params ride as separate (L, 1, C) operands: a packed (L, 3, 2, C)
        # collapses its minor dims into lanes, and Mosaic cannot broadcast a
        # (1, C) row whose lane offset is >= the tile width (smoke failure).
        q = _dot((x32 + qpos).astype(dtype), wq[li].astype(dtype), bq[li])
        k = _dot(mem + pe.astype(dtype), wk[li].astype(dtype), bk[li])
        v = _dot(mem, wv[li].astype(dtype), bv[li])
        y = _attend(q, k, v, wo[li].astype(dtype), bo[li],
                    heads=heads, bias=bias, dtype=dtype)
        x32 = _ln(x32 + y, n1s[li], n1b[li])

        xq = (x32 + qpos).astype(dtype)
        sw = sqkv[li].astype(dtype)
        sb = sbqkv[li]
        qkv = _dot(xq, sw, sb)             # (Q, 3C) f32
        c = x32.shape[-1]
        # the v bias rides as its OWN (L, 1, C) operand: sb[:, 2c:] is a
        # (1, C) row at lane offset 2C, which Mosaic cannot broadcast
        y = _attend(qkv[:, :c], qkv[:, c:2 * c],
                    _dot(x32.astype(dtype), sw[:, 2 * c:], sbv[li]),
                    so[li].astype(dtype), sbo[li],
                    heads=heads, bias=None, dtype=dtype)
        x32 = _ln(x32 + y, n2s[li], n2b[li])

        y = _dot(jnp.maximum(
            _dot(x32.astype(dtype), f1[li].astype(dtype), fb1[li]),
            0.0).astype(dtype), f2[li].astype(dtype), fb2[li])
        x32 = _ln(x32 + y, n3s[li], n3b[li])

        # next mask embedding (shared heads' decoder-norm + mask MLP);
        # rounded to the model dtype like the XLA path's bf16 embedding so
        # borderline m < 0 threshold cells agree
        z = _ln(x32, dns[...], dnb[...]).astype(dtype)
        z = jnp.maximum(_dot(z, m1[...], mb1[...]), 0.0).astype(dtype)
        z = jnp.maximum(_dot(z, m2[...], mb2[...]), 0.0).astype(dtype)
        emb = _dot(z, m3[...], mb3[...]).astype(dtype).astype(f32)

    cx[...] = x32
    ce[...] = emb

    @pl.when(g == groups - 1)
    def _():
        out_ref[0] = x32.astype(out_ref.dtype)


def stack_layer_params(lvl_trees: Sequence[Dict], dtype):
    """Per-level scan-stacked (G, ...) param trees -> (L, ...) packed arrays.

    ``lvl_trees[lvl]`` is the DecoderLayerGroup ``lvl{lvl}_*`` subtree with
    every leaf stacked over the scan axis (G groups); layer ``3g + lvl``
    maps to packed index ``li = g * nl + lvl`` (interleave g-major).
    """
    nl = len(lvl_trees)

    def pack(path):
        leaves = []
        for t in lvl_trees:
            leaf = t
            for k in path:
                leaf = leaf[k]
            leaves.append(leaf)
        a = jnp.stack(leaves, axis=1)          # (G, nl, ...)
        return a.reshape((-1,) + a.shape[2:])  # (L, ...), li = g*nl + lvl

    def dw(path):
        return (pack(path + ("kernel",)).astype(dtype),
                pack(path + ("bias",))[:, None].astype(jnp.float32))

    wq, bq = dw(("cross", "q"))
    wk, bk = dw(("cross", "k"))
    wv, bv = dw(("cross", "v"))
    wo, bo = dw(("cross", "out"))
    sq, sbq = dw(("self_", "q"))
    sk, sbk = dw(("self_", "k"))
    sv, sbv = dw(("self_", "v"))
    so, sbo = dw(("self_", "out"))
    sqkv = jnp.concatenate([sq, sk, sv], axis=-1)
    sbqkv = jnp.concatenate([sbq, sbk, sbv], axis=-1)
    # sbv additionally ships alone for the un-positioned v re-projection
    # (see _stack_kernel: a (1, C) slice at lane offset 2C cannot broadcast)
    # each LN param as its own (L, 1, C) f32 operand (Mosaic layout rule:
    # see _stack_kernel comment)
    norms = [pack((f"norm{i}", nm))[:, None].astype(jnp.float32)
             for i in (1, 2, 3) for nm in ("scale", "bias")]
    f1, fb1 = dw(("ffn", "fc1"))
    f2, fb2 = dw(("ffn", "fc2"))
    return [wq, bq, wk, bk, wv, bv, wo, bo,
            sqkv, sbqkv, sbv, so, sbo, *norms, f1, fb1, f2, fb2]


def fused_decoder_stack(out0, emb0, qpos, mems, pes, feats,
                        lvl_trees: Sequence[Dict], head_params: Dict, *,
                        num_heads: int, num_groups: int,
                        interpret: bool = False):
    """All decoder layers on (B, Q, C) queries in one kernel.

    ``mems``/``pes``/``feats``: per-level (B, T_l, C) memories (level_embed
    pre-added), (T_l, C) sine PEs and (B, T_l, Co) f32 resized mask
    features; layer ``3g + lvl`` attends level ``lvl`` (ref cycling i % 3).
    ``lvl_trees``: scan-stacked per-level weight subtrees (see
    :func:`stack_layer_params`). Returns the final (B, Q, C) query state;
    the caller runs the last head pass (cls/mask at full resolution) in XLA.
    """
    b, q, c = out0.shape
    nl = len(mems)
    dtype = out0.dtype
    f32 = jnp.float32

    weights = stack_layer_params(lvl_trees, dtype)
    hp = head_params
    weights += [hp["decoder_norm"]["scale"][None].astype(f32),
                hp["decoder_norm"]["bias"][None].astype(f32)]
    for nm in ("mask_mlp1", "mask_mlp2", "mask_mlp3"):
        weights += [hp[nm]["kernel"].astype(dtype),
                    hp[nm]["bias"][None].astype(f32)]

    dspec = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda bi, gi: (bi, 0, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    co = emb0.shape[-1]
    inputs = ([out0, emb0.astype(f32), qpos.astype(f32)]
              + [m.astype(dtype) for m in mems]
              + [p.astype(f32) for p in pes]
              + [f.astype(f32) for f in feats] + weights)
    in_specs = ([dspec((q, c)), dspec((q, co)), wspec]
                + [dspec((m.shape[1], c)) for m in mems]
                + [wspec] * nl
                + [dspec((f.shape[1], co)) for f in feats]
                + [wspec] * len(weights))

    kernel = functools.partial(_stack_kernel, heads=num_heads, nl=nl,
                               groups=num_groups, dtype=dtype)
    return pl.pallas_call(
        kernel,
        grid=(b, num_groups),
        in_specs=in_specs,
        out_specs=dspec((q, c)),
        out_shape=jax.ShapeDtypeStruct((b, q, c), dtype),
        scratch_shapes=[pltpu.VMEM((q, c), f32), pltpu.VMEM((q, co), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*inputs)
