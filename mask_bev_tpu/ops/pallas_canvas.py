"""Pillar-table -> BEV canvas scatter as a Pallas kernel (one-hot matmul).

The XLA path (``models/encoder.py:scatter_to_canvas``) costs ~24 ms/batch-8
on v5e: an HBM scatter of P scalar slot ids plus a 250k-row HBM gather. The
TPU-native formulation exploits two facts: (1) pillar slots are sorted by
cell id (from the stream sort), so the pillars of one canvas row form a
contiguous slot range locatable with one sparse ``searchsorted`` per sample;
(2) the MXU turns scatter into matmul — for a block of canvas cells, the
output is ``M @ table_chunk`` where ``M[r, j] = (cells[j] == cell r)`` is a
0/1 selection matrix built with vectorized lane comparisons. No dynamic
stores, no gathers; HBM traffic is one aligned table chunk per canvas row
plus the canvas write itself.

Mosaic constraints shaping the kernel: manual DMA slices must start at
lane/sublane-aligned offsets (hinted via ``pl.multiple_of``), so chunks are
fetched from the 128-aligned floor of the row's first slot with 128 extra
columns of slack.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _canvas_kernel(lo_ref, table_hbm, cells_hbm, out_ref, tbl_s, cells_s,
                   sems, *, rows_per_block: int, width: int, chunk: int):
    b = pl.program_id(0)
    blk = pl.program_id(1)
    rw = rows_per_block * width
    base = blk * rw

    lo = lo_ref[b, blk]
    start = pl.multiple_of((lo // 128) * 128, 128)

    cp0 = pltpu.make_async_copy(
        table_hbm.at[b, pl.ds(start, chunk)], tbl_s, sems.at[0])
    cp1 = pltpu.make_async_copy(
        cells_hbm.at[b, :, pl.ds(start, chunk)], cells_s, sems.at[1])
    cp0.start(); cp1.start()
    cp0.wait(); cp1.wait()

    # selection matrix: M[r, j] = 1 iff slot j's cell is block cell r
    cell_rows = base + jax.lax.broadcasted_iota(jnp.int32, (rw, chunk), 0)
    m = (cells_s[...] == cell_rows).astype(tbl_s.dtype)  # (rw, chunk)
    # 0/1 selection matmul. For f32 tables request HIGHEST so each selected
    # value passes through exactly (default TPU f32 matmul rounds through
    # bf16 passes); bf16 tables are native MXU and Mosaic rejects HIGHEST
    # for them ("Bad lhs type").
    precision = (jax.lax.Precision.HIGHEST
                 if tbl_s.dtype == jnp.float32 else None)
    out_ref[0] = jnp.dot(m, tbl_s[...],
                         preferred_element_type=jnp.float32,
                         precision=precision).astype(out_ref.dtype)


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
                      interpret: bool = False) -> jax.Array:
    """(B, P, C) pillar table + (B, P) ascending cell ids -> (B, H, W, C).

    ``cells`` must be sorted ascending per sample (the stream pillarizer's
    slot order); invalid slots get the H*W sentinel. Each block covers
    ``rows_per_block`` canvas rows; its occupied slots lie within
    [row_start, row_start + rows*W + 128) of the chunk fetched from the
    aligned floor of the range.
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
    # chunk must cover rw occupied slots + up to 127 alignment slack
    chunk = ((rw + 128 + 127) // 128) * 128

    cells = jnp.where(valid, cells, h * w).astype(jnp.int32)
    boundaries = (jnp.arange(nblocks, dtype=jnp.int32) * rw)
    lo = jax.vmap(lambda cl: jnp.searchsorted(cl, boundaries, side="left")
                  .astype(jnp.int32))(cells)

    # pad slots so chunk DMAs never run off the end; sentinel never matches.
    # cells ship as (B, 1, P+chunk): integer-indexing the batch dim keeps the
    # sliced dims (1, chunk) lane-aligned for the DMA (Mosaic rejects
    # sublane slices of size 1)
    pad_cols = [(0, 0), (0, chunk)]
    table_p = jnp.pad(table, pad_cols + [(0, 0)])
    cells_p = jnp.pad(cells, pad_cols, constant_values=h * w + 1)[:, None, :]

    kernel = functools.partial(
        _canvas_kernel, rows_per_block=rows_per_block, width=w, chunk=chunk)
    out = pl.pallas_call(
        kernel,
        grid=(b, nblocks),
        in_specs=[
            # full (B, nblocks) scalar array in SMEM (block dims must equal
            # the array dims or be 8/128-divisible)
            pl.BlockSpec((b, nblocks), lambda bi, blk: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, rw, c), lambda bi, blk: (bi, blk, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), table.dtype),
        scratch_shapes=[
            pltpu.VMEM((chunk, c), table.dtype),
            pltpu.VMEM((1, chunk), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(lo, table_p, cells_p)
    return out.reshape(b, h, w, c)
