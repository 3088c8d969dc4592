"""Fused Mask2Former decoder layer (final_only inference path).

One Pallas kernel runs an ENTIRE decoder layer per batch element: the
level-resolution bias einsum + threshold (masked cross-attention bias from
the carried mask embedding), masked cross-attention, self-attention, FFN,
the three post-norms, and the next mask embedding (decoder-norm + 3-layer
MLP). The XLA path executes ~30 separate ops per layer on (45, 256)-sized
tensors, where per-op fixed costs dominate; fusing a layer into one kernel
removes those dispatch bubbles and keeps the tiny query state in VMEM for
the whole layer.

Semantics mirror ``models/mask2former.py`` exactly (reference
``mask2former_head.py:428-562``): additive -1e9 bias where
``sigmoid(m) < 0.5`` (== ``m < 0``), all-blocked query rows cleared,
post-norm residual order cross -> self -> FFN, mask embedding from the
decoder-norm. Equivalence is tested in interpret mode
(``tests/test_pallas_decoder_layer.py``).
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _ln(x32, ref):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + 1e-6) * ref[0:1, :] + ref[1:2, :]


def _dot(a, b, bias=None):
    y = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y if bias is None else y + bias


def _mha(x_q, x_kv, v_src, wq, bq, wk, bk, wv, bv, wo, bo, *,
         heads: int, bias=None, dtype=jnp.bfloat16):
    """Multi-head attention matching models/mask2former.py semantics."""
    c = x_q.shape[-1]
    hd = c // heads
    scale = hd ** -0.5
    q = _dot(x_q, wq[...], bq[...]).astype(dtype)
    k = _dot(x_kv, wk[...], bk[...]).astype(dtype)
    v = _dot(v_src, wv[...], bv[...]).astype(dtype)
    cols = []
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        attn = jax.lax.dot_general(
            (q[:, sl].astype(jnp.float32) * scale).astype(dtype), k[:, sl],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if bias is not None:
            attn = attn + bias
        attn = jax.nn.softmax(attn, axis=-1)
        cols.append(jax.lax.dot_general(
            attn.astype(dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    o = jnp.concatenate(cols, axis=-1).astype(dtype)
    return _dot(o, wo[...], bo[...])


def _layer_kernel(out_ref, emb_ref, qpos_ref, mem_ref, pe_ref, feat_ref,
                  *wrefs, heads: int, last: bool):
    (wq, bq, wk, bk, wv, bv, wo, bo,
     sq, sbq, sk, sbk, sv, sbv, so, sbo,
     n1, n2, n3, f1, fb1, f2, fb2,
     dn, m1, mb1, m2, mb2, m3, mb3) = wrefs[:-2]
    out_o, emb_o = wrefs[-2], wrefs[-1]

    x = out_ref[0]                       # (Q, C)
    emb = emb_ref[0]
    qpos = qpos_ref[0]
    mem = mem_ref[0]                     # (K, C), level_embed pre-added
    pe = pe_ref[0]
    dtype = x.dtype

    # masked cross-attention bias from the carried mask embedding:
    # sigmoid(m) < 0.5  <=>  m < 0; all-blocked rows cleared
    m = jax.lax.dot_general(
        emb.astype(jnp.float32), feat_ref[0].astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    blocked = m < 0.0                    # (Q, K)
    all_blocked = jnp.all(blocked, axis=-1, keepdims=True)
    bias = jnp.where(blocked & ~all_blocked, _NEG, 0.0)

    y = _mha((x + qpos).astype(dtype), (mem + pe).astype(dtype), mem,
             wq, bq, wk, bk, wv, bv, wo, bo,
             heads=heads, bias=bias, dtype=dtype)
    x = _ln(x.astype(jnp.float32) + y, n1).astype(dtype)
    xq = (x + qpos).astype(dtype)
    y = _mha(xq, xq, x, sq, sbq, sk, sbk, sv, sbv, so, sbo,
             heads=heads, dtype=dtype)
    x = _ln(x.astype(jnp.float32) + y, n2).astype(dtype)
    y = _dot(jnp.maximum(_dot(x, f1[...], fb1[...]), 0.0).astype(dtype),
             f2[...], fb2[...])
    x = _ln(x.astype(jnp.float32) + y, n3).astype(dtype)
    out_o[0] = x

    if last:
        emb_o[0] = emb.astype(dtype)  # unused afterwards; skip the MLP
        return
    z = _ln(x.astype(jnp.float32), dn).astype(dtype)
    z = jnp.maximum(_dot(z, m1[...], mb1[...]), 0.0).astype(dtype)
    z = jnp.maximum(_dot(z, m2[...], mb2[...]), 0.0).astype(dtype)
    emb_o[0] = _dot(z, m3[...], mb3[...]).astype(dtype)


def fused_decoder_layer(out, emb, qpos, mem, pe, feat, params: Dict,
                        head_params: Dict, *, num_heads: int,
                        last: bool = False, interpret: bool = False):
    """One decoder layer on (B, Q, C) queries vs a (B, K, C) memory level.

    ``params``: this layer's weight tree (keys ``cross``/``self_``/
    ``norm1..3``/``ffn``); ``head_params``: the shared MaskHeads tree (only
    decoder_norm + mask MLP are read). Returns (out', emb'); with
    ``last=True`` the next-bias embedding is skipped (final layer).
    """
    b, q, c = out.shape
    dtype = out.dtype

    def dw(m):  # DenseWithBias -> (kernel, (1, F) bias)
        return m["kernel"].astype(dtype), m["bias"][None].astype(jnp.float32)

    def ln(m):  # LayerNorm -> (2, C) f32 [scale; bias]
        return jnp.stack([m["scale"], m["bias"]]).astype(jnp.float32)

    cr, se = params["cross"], params["self_"]
    hp = head_params
    weights = []
    for mod in (cr["q"], cr["k"], cr["v"], cr["out"],
                se["q"], se["k"], se["v"], se["out"]):
        weights += dw(mod)
    weights += [ln(params["norm1"]), ln(params["norm2"]), ln(params["norm3"])]
    weights += [*dw(params["ffn"]["fc1"]), *dw(params["ffn"]["fc2"])]
    weights += [ln(hp["decoder_norm"]),
                *dw(hp["mask_mlp1"]), *dw(hp["mask_mlp2"]),
                *dw(hp["mask_mlp3"])]

    k = mem.shape[1]
    pe_b = jnp.broadcast_to(pe.astype(dtype), (1, k, c))
    qpos_b = jnp.broadcast_to(qpos.astype(dtype), (1, q, c))

    dspec = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM)
    const3 = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda bi: (0, 0, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(_layer_kernel, heads=num_heads, last=last)
    out2, emb2 = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[dspec((q, c)), dspec((q, c)), const3((q, c)),
                  dspec((k, c)), const3((k, c)), dspec((k, c))]
        + [wspec] * len(weights),
        out_specs=[dspec((q, c)), dspec((q, c))],
        out_shape=[jax.ShapeDtypeStruct((b, q, c), dtype),
                   jax.ShapeDtypeStruct((b, q, c), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(out, emb.astype(dtype), qpos_b, mem.astype(dtype), pe_b,
      feat.astype(jnp.float32), *weights)
    return out2, emb2
