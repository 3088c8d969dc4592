"""Fused window multi-head self-attention Pallas kernel (Swin eval path).

The XLA WindowMSA materializes the qkv tensor, two 5-D transposes, the f32
attention matrix and the output transpose in HBM every block — measured
~4.5 ms/batch-8 for stage 0 of the flagship backbone against a ~0.3 ms
matmul floor. This kernel keeps a group of G windows resident in VMEM and
runs qkv projection, per-head batched attention (Mosaic supports batched
``dot_general``), softmax, and the output projection in one pass; the only
HBM traffic is the window tensor in/out and the per-window additive bias.

The static shifted-window mask is pre-folded into the relative-position
bias per window (one (nW, h, n, n) array built in XLA from the bias table),
so shifted and unshifted blocks use the same kernel. Window partitioning
stays in XLA (cheap, ~1 ms) — the kernel consumes pre-partitioned
(B, nW, n, C) windows.

Equivalence with the XLA path is tested in ``tests/test_pallas_window_msa.py``
(interpret mode on CPU, compiled on TPU). Reference semantics:
``swin.py:22-124`` (qkv bias, scaled dot product, relative position bias).

Measured result (v5e, flagship, batch 8): 36.3 ms backbone vs 34.6 ms for
the XLA path — the per-head batched dots at small group sizes do not beat
XLA's own scheduling, so ``use_pallas_attention`` defaults to OFF and this
kernel is an experimental option (larger group sizes exceed VMEM at stage
3's 1536-dim windows).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _msa_kernel(x_ref, bias_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                out_ref, *, num_heads: int, scale: float):
    x = x_ref[0]          # (G, n, C) bf16/f32
    g, n, c = x.shape
    hd = c // num_heads

    qkv = jax.lax.dot_general(
        x.reshape(g * n, c), wqkv_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bqkv_ref[...]
    qkv = qkv.reshape(g, n, 3 * c).astype(x.dtype)

    out_cols = []
    for h in range(num_heads):
        q = qkv[:, :, h * hd: (h + 1) * hd]
        k = qkv[:, :, c + h * hd: c + (h + 1) * hd]
        v = qkv[:, :, 2 * c + h * hd: 2 * c + (h + 1) * hd]
        attn = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (G, n, n)
        attn = attn * scale + bias_ref[:, h]
        attn = jax.nn.softmax(attn, axis=-1)
        out_cols.append(jax.lax.dot_general(
            attn.astype(x.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))  # (G, n, hd)
    o = jnp.concatenate(out_cols, axis=-1)  # (G, n, C) f32

    o = jax.lax.dot_general(
        o.reshape(g * n, c).astype(x.dtype), wproj_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bproj_ref[...]
    out_ref[0] = o.reshape(g, n, c).astype(out_ref.dtype)


def fused_window_msa(
    xw: jax.Array,        # (B, nW, n, C) pre-partitioned windows
    bias: jax.Array,      # (nW, h, n, n) additive bias (rel-pos [+ mask])
    wqkv: jax.Array, bqkv: jax.Array,   # (C, 3C), (3C,)
    wproj: jax.Array, bproj: jax.Array,  # (C, C), (C,)
    *, num_heads: int, group: int = 8, interpret: bool = False,
) -> jax.Array:
    """Returns (B, nW, n, C) attended windows."""
    b, nw, n, c = xw.shape
    scale = (c // num_heads) ** -0.5
    nw_pad = ((nw + group - 1) // group) * group
    if nw_pad != nw:
        xw = jnp.pad(xw, [(0, 0), (0, nw_pad - nw), (0, 0), (0, 0)])
        bias = jnp.pad(bias, [(0, nw_pad - nw), (0, 0), (0, 0), (0, 0)])

    kernel = functools.partial(
        _msa_kernel, num_heads=num_heads, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(b, nw_pad // group),
        in_specs=[
            pl.BlockSpec((1, group, n, c), lambda bi, wi: (bi, wi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, num_heads, n, n), lambda bi, wi: (wi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, group, n, c), lambda bi, wi: (bi, wi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nw_pad, n, c), xw.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xw, bias.astype(jnp.float32), wqkv.astype(xw.dtype),
      bqkv[None, :].astype(jnp.float32), wproj.astype(xw.dtype),
      bproj[None, :].astype(jnp.float32))
    return out[:, :nw]
