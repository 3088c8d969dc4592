"""Fused canvas -> patch-embed -> LayerNorm Pallas kernel (eval path).

The canvas+norm kernel emits the pseudo-image in its natural batch-minor
flat form ``(H*W, B*C)`` (cell-major rows, ``b*C`` lanes). The XLA path
then pays three full passes over it before stage 0 of the backbone:

  * a 0.5 GB/b8 relayout into the conv custom-call's standard NHWC tiling
    (measured 1.57 ms/b8 in the r5 full-graph trace),
  * the patch-embed conv itself (k = s = patch, VALID -> exactly a matmul
    of the patchified canvas against the reshaped kernel),
  * the ``patch_norm`` LayerNorm (per-token stats, another ~1 ms/b8 of
    convert+reduce passes).

This kernel replaces all three: one grid step loads ``patch`` cell-rows of
the flat canvas (a contiguous, aligned block), patchifies them in VMEM
(per-(dh, b) lane slices + row-major ``(W, C) -> (W/p, p*C)`` shape casts
— no HBM relayout ever materializes), runs ONE ``(B*W/p, p*p*C) @ E``
matmul against the reshaped conv kernel, adds the bias, applies the
token LayerNorm in f32, and writes the ``(B, W/p, E)`` output slab.

Semantics match ``nn.Conv(E, (p, p), strides p, VALID)`` + flax LayerNorm
(eps 1e-6, f32 stats) up to matmul accumulation order (the conv
custom-call and this matmul both accumulate bf16 products in f32); the
bias add happens in f32 here (the XLA path adds it in bf16). Equivalence
is tested in ``tests/test_pallas_patch_embed.py``.

Reference workload: ``mask_bev_backbone.py:50`` (patch embed stride 4) on
the (500, 500, 128) pseudo-image of ``mask_bev_module.py:65-80``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _patch_embed_kernel(x_ref, w_ref, b_ref, ls_ref, lb_ref, out_ref, *,
                        p: int, bsz: int, c: int, gw: int, eps: float):
    """x_ref (1, p, W, B*C); out_ref (B, gw, E); w_ref (p*p*C, E)."""
    x3 = x_ref[0]                                  # (p, W, B*C)
    rows = []
    for b in range(bsz):
        taps = []
        for dh in range(p):
            y = x3[dh, :, b * c:(b + 1) * c]        # (W, C) one cell-row
            # row-major (W, C) -> (W/p, p*C): token pw's lanes are the p
            # consecutive cell-columns' channels [dw*C + cc] — exactly the
            # (dw, cc) order of the reshaped conv kernel
            taps.append(y.reshape(gw, p * c))
        rows.append(jnp.concatenate(taps, axis=1))  # (gw, p*p*C), dh-major
    t = jnp.concatenate(rows, axis=0)               # (B*gw, p*p*C)

    y = jax.lax.dot_general(t, w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + b_ref[...]                              # f32 bias add

    # flax nn.LayerNorm fast-variance form: var = E[x^2] - E[x]^2 (f32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(y * y, axis=-1, keepdims=True) - mu * mu
    y = ((y - mu) * jax.lax.rsqrt(var + eps) * ls_ref[...] + lb_ref[...])
    out_ref[...] = y.reshape(bsz, 1, gw, -1).astype(out_ref.dtype)


def fused_patch_embed(
    canvas_flat: jax.Array,   # (H*W, B*C) batch-minor flat canvas
    kernel: jax.Array,        # (p, p, C, E) conv kernel (flax HWIO)
    bias: jax.Array,          # (E,)
    ln_scale: jax.Array,      # (E,)
    ln_bias: jax.Array,       # (E,)
    *, h: int, w: int, bsz: int, patch: int, eps: float = 1e-6,
    out_dtype=jnp.bfloat16, interpret: bool = False,
) -> jax.Array:
    """Flat canvas -> patch-embedded, LayerNorm-ed tokens (B, gh*gw, E).

    Requires ``h % patch == 0 and w % patch == 0`` (the flagship 500-grid
    with patch 4 needs no padding) and the batch-minor canvas layout of
    ``pallas_canvas.canvas_from_table(flat_output=True)``.
    """
    hw, bc = canvas_flat.shape
    p = patch
    assert hw == h * w and bc == bsz * (bc // bsz), (hw, h, w, bc)
    assert h % p == 0 and w % p == 0, (h, w, p)
    c = bc // bsz
    e = kernel.shape[-1]
    assert kernel.shape == (p, p, c, e), (kernel.shape, p, c, e)
    gh, gw = h // p, w // p

    x4 = canvas_flat.reshape(gh, p, w, bc)          # free row split
    f32 = jnp.float32
    # (p, p, C, E) -> (p*p*C, E), row index = dh*(p*C) + dw*C + cc — the
    # same (dh, dw, cc) order the kernel's taps concatenate
    wm = kernel.reshape(p * p * c, e).astype(canvas_flat.dtype)

    kfn = functools.partial(_patch_embed_kernel, p=p, bsz=bsz, c=c, gw=gw,
                            eps=eps)
    out = pl.pallas_call(
        kfn,
        grid=(gh,),
        in_specs=[
            pl.BlockSpec((1, p, w, bc), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bsz, 1, gw, e), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, gh, gw, e), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(x4, wm, bias[None].astype(f32), ln_scale[None].astype(f32),
      ln_bias[None].astype(f32))
    return out.reshape(bsz, gh * gw, e)
