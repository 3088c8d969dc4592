"""Pillar-table -> BEV canvas scatter as a Pallas kernel (one-hot matmul).

The XLA path (``models/encoder.py:scatter_to_canvas``) costs ~19 ms/batch-8
on v5e: an HBM scatter of P scalar slot ids plus a 250k-row HBM gather. The
TPU-native formulation exploits two facts: (1) pillar slots are sorted by
cell id (from the stream sort), so the pillars of one canvas row form a
contiguous slot range locatable with one sparse ``searchsorted`` per sample;
(2) the MXU turns scatter into matmul — for a block of canvas cells, the
output is ``M @ table_chunk`` where ``M[r, j] = (cells[j] == cell r)`` is a
0/1 selection matrix built with vectorized lane comparisons. No dynamic
stores, no gathers; HBM traffic is one aligned table chunk per canvas row
plus the canvas write itself.

The chunk is processed in sub-chunks of 384 slots, each gated on actually
containing occupied slots (``lo``/``hi`` from the per-block searchsorted):
a worst-case block can hold rows*W pillars, but a typical 2-canvas-row
block holds ~130, so the selection matmul usually runs 1 of 3 sub-chunks —
this alone is ~2x on the kernel.

Mosaic constraints shaping the kernel: manual DMA slices must start at
lane/sublane-aligned offsets (hinted via ``pl.multiple_of``), so sub-chunks
are fetched from the 128-aligned floor of the row's first slot with 128
extra columns of slack.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _canvas_kernel(*refs, rows_per_block: int, width: int, sub: int,
                   nsub: int, norm: bool, eps: float = 1e-3):
    if norm:
        # fused pseudo-image LayerNorm epilogue (eval path): stats (B, 2)
        # ride SMEM, the per-block affine slabs ride VMEM BlockSpecs
        (lo_ref, stats_ref, table_hbm, cells_hbm, scale_ref, bias_ref,
         out_ref, tbl_s, cells_s, acc, sems) = refs
    else:
        (lo_ref, table_hbm, cells_hbm, out_ref,
         tbl_s, cells_s, acc, sems) = refs
    b = pl.program_id(0)
    blk = pl.program_id(1)
    rw = rows_per_block * width
    base = blk * rw

    lo = lo_ref[b, blk]
    hi = lo_ref[b, blk + 1]
    start = pl.multiple_of((lo // 128) * 128, 128)

    # DMAs run unconditionally (sub-chunk traffic is ~0.1 ms/batch total);
    # only the COMPUTE is gated below — the matmul is the expensive part,
    # and DMA-inside-cond is not supported in interpret mode anyway
    cps = []
    for s in range(nsub):
        off = pl.multiple_of(start + s * sub, 128)
        cp0 = pltpu.make_async_copy(
            table_hbm.at[b, pl.ds(off, sub)], tbl_s.at[s], sems.at[0, s])
        cp1 = pltpu.make_async_copy(
            cells_hbm.at[b, :, pl.ds(off, sub)], cells_s.at[s],
            sems.at[1, s])
        cp0.start(); cp1.start()
        cps.append((cp0, cp1))

    acc[...] = jnp.zeros(acc.shape, acc.dtype)
    cell_rows = base + jax.lax.broadcasted_iota(jnp.int32, (rw, sub), 0)
    for s in range(nsub):
        cps[s][0].wait()
        cps[s][1].wait()

        # sub-chunk s covers slots [start + s*sub, start + (s+1)*sub); all
        # occupied slots of this block lie in [lo, hi) and start >= lo-127,
        # so sub-chunks at or past hi contribute nothing — skip their
        # matmul entirely (typical blocks run 1 of nsub sub-chunks)
        @pl.when(start + s * sub < hi)
        def _(s=s):
            # selection matrix: M[r, j] = 1 iff slot j's cell is block cell r
            m = (cells_s[s] == cell_rows).astype(tbl_s.dtype)  # (rw, sub)
            # 0/1 selection matmul. For f32 tables request HIGHEST so each
            # selected value passes through exactly (default TPU f32 matmul
            # rounds through bf16 passes); bf16 tables are native MXU and
            # Mosaic rejects HIGHEST for them ("Bad lhs type").
            precision = (jax.lax.Precision.HIGHEST
                         if tbl_s.dtype == jnp.float32 else None)
            acc[...] += jnp.dot(m, tbl_s[s],
                                preferred_element_type=jnp.float32,
                                precision=precision)
    if norm:
        mean = stats_ref[b, 0]
        rstd = jax.lax.rsqrt(stats_ref[b, 1] + eps)
        scale = scale_ref[0].astype(jnp.float32)   # (rw | 1, C)
        bias = bias_ref[0].astype(jnp.float32)
        out_ref[0] = (((acc[...] - mean) * rstd) * scale
                      + bias).astype(out_ref.dtype)
    else:
        out_ref[0] = acc[...].astype(out_ref.dtype)


def pick_rows_per_block(h: int, w: int) -> int:
    """Smallest r dividing h with r*w divisible by 8 (Mosaic block sublane
    constraint); 0 if none exists (caller falls back to the XLA path)."""
    for r in range(1, h + 1):
        if h % r == 0 and (r * w) % 8 == 0:
            return r
    return 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def canvas_scatter(table, cells, valid, grid_hw):
    """Differentiable pillar-table -> canvas scatter (Pallas forward).

    The backward pass is exact and trivial: each pillar row lands in one
    canvas cell, so d_table = gather(d_canvas, cells) — the training step
    gets the kernel's speed without a Pallas VJP.
    """
    return canvas_from_table(table, cells, valid, grid_hw)


def _canvas_scatter_fwd(table, cells, valid, grid_hw):
    return canvas_from_table(table, cells, valid, grid_hw), (cells, valid)


def _canvas_scatter_bwd(grid_hw, res, g):
    cells, valid = res
    h, w = grid_hw
    b = g.shape[0]
    gf = g.reshape(b, h * w, g.shape[-1])
    idx = jnp.clip(cells, 0, h * w - 1)
    d_table = jnp.take_along_axis(gf, idx[..., None], axis=1)
    d_table = jnp.where(valid[..., None], d_table, 0.0)
    return d_table, None, None


canvas_scatter.defvjp(_canvas_scatter_fwd, _canvas_scatter_bwd)


def canvas_from_table(table: jax.Array, cells: jax.Array, valid: jax.Array,
                      grid_hw, *, rows_per_block: int = 0,
                      norm_stats=None, norm_affine=None, norm_eps: float = 1e-3,
                      interpret: bool = False) -> jax.Array:
    """(B, P, C) pillar table + (B, P) ascending cell ids -> (B, H, W, C).

    ``cells`` must be sorted ascending per sample (the stream pillarizer's
    slot order); invalid slots get the H*W sentinel. Each block covers
    ``rows_per_block`` canvas rows; its occupied slots lie within
    [row_start, row_start + rows*W + 128) of the sub-chunks fetched from the
    aligned floor of the range.

    ``norm_stats``/``norm_affine``: optional fused pseudo-image LayerNorm
    epilogue (eval path) — stats = per-sample (mean (B,), var (B,)), affine
    = (scale, bias) of shape (H, W, C) (full mode) or broadcastable (1, 1, C)
    (channel mode). Writing the NORMALIZED canvas directly saves one full
    canvas HBM round trip vs a separate norm op.
    """
    h, w = grid_hw
    b, p, c = table.shape
    if rows_per_block <= 0:
        rows_per_block = pick_rows_per_block(h, w)
        assert rows_per_block, (h, w)
    assert (h % rows_per_block) == 0, (h, rows_per_block)
    assert (rows_per_block * w) % 8 == 0, (rows_per_block, w)
    nblocks = h // rows_per_block
    rw = rows_per_block * w
    # sub-chunks must cover rw occupied slots + up to 127 alignment slack
    sub = 384
    nsub = (rw + 128 + sub - 1) // sub

    cells = jnp.where(valid, cells, h * w).astype(jnp.int32)
    # lo[blk] = first slot of block blk; lo[nblocks] = end of valid slots
    boundaries = (jnp.arange(nblocks + 1, dtype=jnp.int32) * rw)
    lo = jax.vmap(lambda cl: jnp.searchsorted(cl, boundaries, side="left")
                  .astype(jnp.int32))(cells)

    # pad slots so sub-chunk DMAs never run off the end; sentinel never
    # matches. cells ship as (B, 1, P+pad): integer-indexing the batch dim
    # keeps the sliced dims (1, sub) lane-aligned for the DMA (Mosaic
    # rejects sublane slices of size 1)
    pad = nsub * sub
    pad_cols = [(0, 0), (0, pad)]
    table_p = jnp.pad(table, pad_cols + [(0, 0)])
    cells_p = jnp.pad(cells, pad_cols, constant_values=h * w + 1)[:, None, :]

    norm = norm_stats is not None
    kernel = functools.partial(
        _canvas_kernel, rows_per_block=rows_per_block, width=w, sub=sub,
        nsub=nsub, norm=norm, eps=norm_eps)
    in_specs = [
        # full (B, nblocks+1) scalar array in SMEM
        pl.BlockSpec((b, nblocks + 1), lambda bi, blk: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
    ]
    inputs = [lo, table_p, cells_p]
    if norm:
        mean, var = norm_stats
        stats = jnp.stack([mean, var], axis=-1).astype(jnp.float32)  # (B, 2)
        in_specs.insert(1, pl.BlockSpec((b, 2), lambda bi, blk: (0, 0),
                                        memory_space=pltpu.SMEM))
        inputs.insert(1, stats)
        for arr in norm_affine:  # (scale, bias), shipped separately (no
            # stacked copy of the 128 MB full-mode affines)
            # shipped in storage dtype (kernel casts blocks to f32): a host
            # astype here would copy the 128 MB full-mode affine per forward
            if arr.size == c:  # channel mode: (1, 1, C) broadcast slab
                inputs.append(arr.reshape(1, 1, c))
                in_specs.append(pl.BlockSpec(
                    (1, 1, c), lambda bi, blk: (0, 0, 0),
                    memory_space=pltpu.VMEM))
            else:  # full mode: (H*W, C), one (rw, C) slab per block
                inputs.append(arr.reshape(1, h * w, c))
                in_specs.append(pl.BlockSpec(
                    (1, rw, c), lambda bi, blk: (0, blk, 0),
                    memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        kernel,
        grid=(b, nblocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, rw, c), lambda bi, blk: (bi, blk, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), table.dtype),
        scratch_shapes=[
            pltpu.VMEM((nsub, sub, c), table.dtype),
            pltpu.VMEM((nsub, 1, sub), jnp.int32),
            pltpu.VMEM((rw, c), jnp.float32),
            pltpu.SemaphoreType.DMA((2, nsub)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    return out.reshape(b, h, w, c)
