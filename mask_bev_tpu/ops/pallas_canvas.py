"""Pillar-table -> BEV canvas scatter as a Pallas kernel (one-hot matmul).

The XLA path (``models/encoder.py:scatter_to_canvas``) costs ~19 ms/batch-8
on v5e: an HBM scatter of P scalar slot ids plus a 250k-row HBM gather. The
TPU-native formulation exploits two facts: (1) slots are sorted by cell id
(from the stream sort), so the slots of one canvas row-block form a
contiguous range locatable with one sparse ``searchsorted`` per sample;
(2) the MXU turns scatter into matmul — for a block of canvas cells, the
output is ``M @ table_chunk`` where ``M[r, j] = (cells[j] == cell r)`` is a
0/1 selection matrix built with vectorized lane comparisons. No dynamic
stores, no gathers; HBM traffic is one aligned table chunk per canvas row
plus the canvas write itself.

Round-4 restructure (the round-3 kernel was ~5.3 ms/b8, ~2.5 ms of which
was re-reading the 128 MB full-mode LayerNorm affine once per SAMPLE):

* the grid is ``(nblocks, batch)`` — batch iterates INNERMOST, so the
  per-block affine slabs (and the output-block pipeline) revisit the same
  block index across the batch and Pallas fetches each 1 MB slab once per
  block instead of once per (block, sample);
* the sub-chunk scan is a dynamic ``fori_loop`` with a 2-deep
  double-buffered manual DMA pipeline: exactly ``ceil((hi-lo)/sub)``
  chunks are fetched and matmul'd per block (the round-3 kernel statically
  unrolled the worst case and DMA'd all of it unconditionally). This also
  removes the static bound on slots-per-block, so the kernel accepts
  STREAM-sized slot arrays (one slot per sorted point, dup-filled cells,
  see ``ops/pallas_pfn.fused_stream_pfn_slots``) — the 32k-pillar dense
  table and its gather/compaction disappear from the eval path entirely.

Mosaic constraints shaping the kernel: manual DMA slices must start at
lane/sublane-aligned offsets (hinted via ``pl.multiple_of``), so sub-chunks
are fetched from the 128-aligned floor of the block's first slot.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _canvas_kernel(*refs, rows_per_block: int, width: int, sub: int,
                   norm: bool, eps: float = 1e-3):
    if norm:
        # fused pseudo-image LayerNorm epilogue (eval path): stats (B, 2)
        # ride SMEM, the per-block affine slabs ride VMEM BlockSpecs
        (lo_ref, stats_ref, table_hbm, cells_hbm, scale_ref, bias_ref,
         out_ref, tbl_s, cells_s, pf_tbl, pf_cells, acc, sems, pf_sems) = refs
    else:
        (lo_ref, table_hbm, cells_hbm, out_ref,
         tbl_s, cells_s, pf_tbl, pf_cells, acc, sems, pf_sems) = refs
    blk = pl.program_id(0)
    b = pl.program_id(1)
    nblk = pl.num_programs(0)
    nb = pl.num_programs(1)
    rw = rows_per_block * width
    base = blk * rw

    lo = lo_ref[b, blk]
    hi = lo_ref[b, blk + 1]
    start = pl.multiple_of((lo // 128) * 128, 128)
    n_it = jnp.maximum((hi - start + sub - 1) // sub, 0)

    def cp_pf(bi, off):
        off = pl.multiple_of(off, 128)
        c0 = pltpu.make_async_copy(
            table_hbm.at[bi, pl.ds(off, sub)], pf_tbl, pf_sems.at[0])
        c1 = pltpu.make_async_copy(
            cells_hbm.at[bi, :, pl.ds(off, sub)], pf_cells, pf_sems.at[1])
        return c0, c1

    def cp(i):
        off = pl.multiple_of(start + i * sub, 128)
        c0 = pltpu.make_async_copy(
            table_hbm.at[b, pl.ds(off, sub)], tbl_s.at[i % 2],
            sems.at[0, i % 2])
        c1 = pltpu.make_async_copy(
            cells_hbm.at[b, :, pl.ds(off, sub)], cells_s.at[i % 2],
            sems.at[1, i % 2])
        return c0, c1

    # chunk 0 rides the dedicated prefetch buffers: it was issued during the
    # PREVIOUS grid step (below), so the wait here normally finds the data
    # already landed — the per-block DMA-latency stall this kills was ~1-2 us
    # x nblocks x batch. The first grid step self-issues.
    @pl.when((blk == 0) & (b == 0))
    def _():
        c0, c1 = cp_pf(b, start)
        c0.start()
        c1.start()

    @pl.when(n_it > 1)
    def _():
        c0, c1 = cp(1)
        c0.start()
        c1.start()

    c0, c1 = cp_pf(b, start)
    c0.wait()
    c1.wait()

    cell_rows = base + jax.lax.broadcasted_iota(jnp.int32, (rw, sub), 0)
    # 0/1 selection matmul. For f32 tables request HIGHEST so each selected
    # value passes through exactly (default TPU f32 matmul rounds through
    # bf16 passes); bf16 tables are native MXU and Mosaic rejects HIGHEST
    # for them ("Bad lhs type").
    precision = (jax.lax.Precision.HIGHEST
                 if tbl_s.dtype == jnp.float32 else None)

    # selection matrix: M[r, j] = 1 iff slot j's cell is block cell r. The
    # n_it == 0 gate zeroes M instead of branching around the matmul (an
    # empty block is rare; a wasted matmul is cheaper than a fourth branch;
    # Mosaic cannot select on i1 vectors, so the gate is a scalar multiply)
    gate = (n_it > 0).astype(pf_tbl.dtype)
    m = (pf_cells[...] == cell_rows).astype(pf_tbl.dtype) * gate
    acc[...] = jnp.dot(m, pf_tbl[...],
                       preferred_element_type=jnp.float32,
                       precision=precision)

    # pf buffers are consumed — issue the SUCCESSOR grid step's chunk 0 so
    # its arrival overlaps the rest of this block (remaining chunks, norm
    # epilogue, pipelined output write)
    nxt_b = jnp.where(b + 1 < nb, b + 1, 0)
    nxt_blk = jnp.where(b + 1 < nb, blk, blk + 1)
    lo_n = lo_ref[nxt_b, jnp.minimum(nxt_blk, nblk - 1)]
    start_n = (lo_n // 128) * 128

    @pl.when(~((blk == nblk - 1) & (b == nb - 1)))
    def _():
        c0, c1 = cp_pf(nxt_b, start_n)
        c0.start()
        c1.start()

    def body(i, carry):
        @pl.when(i + 1 < n_it)
        def _():
            c0, c1 = cp(i + 1)
            c0.start()
            c1.start()
        c0, c1 = cp(i)
        c0.wait()
        c1.wait()
        m = (cells_s[i % 2] == cell_rows).astype(tbl_s.dtype)  # (rw, sub)
        acc[...] += jnp.dot(m, tbl_s[i % 2],
                            preferred_element_type=jnp.float32,
                            precision=precision)
        return carry

    jax.lax.fori_loop(1, n_it, body, 0)

    if norm:
        mean = stats_ref[b, 0]
        rstd = jax.lax.rsqrt(stats_ref[b, 1] + eps)
        scale = scale_ref[0].astype(jnp.float32)   # (rw | 1, C)
        bias = bias_ref[0].astype(jnp.float32)
        res = (((acc[...] - mean) * rstd) * scale + bias)
    else:
        res = acc[...]
    c_ = res.shape[-1]
    if out_ref.ndim == 2:
        # batch-minor flat output (H*W, B*C): out block is (rw, B*C),
        # revisited across the inner batch grid dim; each step stores its
        # sample's C-wide lane slice at offset b*C (128-aligned, so Mosaic
        # takes the dynamic store — a 1-SUBLANE slice of a (rw, B, C)
        # block it rejects).
        out_ref[:, pl.ds(pl.multiple_of(b * c_, c_), c_)] = (
            res.astype(out_ref.dtype))
    else:
        # standard-NHWC output: each (blk, b) step owns its own
        # (1, rows, W, C) block of the (B, H, W, C) array — the exact
        # tiled layout the downstream patch-embed conv custom-call wants
        # (the batch-minor flat form cost a 0.5 GB/b8 relayout, measured
        # 1.57 ms in the r5 full-graph trace)
        out_ref[0] = res.reshape(rows_per_block, width, c_).astype(
            out_ref.dtype)


def pick_rows_per_block(h: int, w: int, slots: int = 0) -> int:
    """Block height r: must divide h with r*w divisible by 8 (Mosaic block
    sublane constraint); 0 if none exists (caller falls back to XLA).

    The selection matmul costs O(r*w x executed-chunk-slots): smaller r
    means proportionally fewer FLOPs but MORE per-block chunk-rounding
    slack (each block rounds its slot range up to `sub`). With the r3
    32k-pillar dense tables the slack dominated (250 blocks measured
    ~1 ms/b8 slower than 125); with the r4 131k-slot streams (~4 chunks/
    block at r=4) the FLOP term dominates, so `slots` >= 64k prefers the
    smallest valid r (measured ~1 ms/b8 back the other way)."""
    first = 0
    small = slots >= 65536
    for r in range(1, h + 1):
        if h % r == 0 and (r * w) % 8 == 0 and r * w <= 4096:
            first = first or r
            if small or h // r <= 128:
                return r
    return first


def _canvas_nhwc_via_flat(table, cells, valid, grid_hw):
    """Flat kernel output + XLA transpose to NHWC — the TRAIN-path form.

    The kernel's direct 4-D NHWC output (eval default) PINS that layout;
    in the train graph the backward's gather then pays a forced relayout
    around it (bench train step 327 -> 425 ms/b4 when the pinned form was
    used). Emitting flat and letting XLA place the transpose keeps the
    layout choice with the compiler."""
    h, w = grid_hw
    b, _, c = table.shape
    out = canvas_from_table(table, cells, valid, grid_hw, flat_output=True)
    return jnp.transpose(out.reshape(h, w, b, c), (2, 0, 1, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def canvas_scatter(table, cells, valid, grid_hw):
    """Differentiable pillar-table -> canvas scatter (Pallas forward).

    The backward pass is exact and trivial: each pillar row lands in one
    canvas cell, so d_table = gather(d_canvas, cells) — the training step
    gets the kernel's speed without a Pallas VJP.
    """
    return _canvas_nhwc_via_flat(table, cells, valid, grid_hw)


def _canvas_scatter_fwd(table, cells, valid, grid_hw):
    return _canvas_nhwc_via_flat(table, cells, valid, grid_hw), (cells, valid)


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


def canvas_from_table(table: jax.Array, cells: jax.Array, valid, grid_hw,
                      *, rows_per_block: int = 0, pre_padded: bool = False,
                      norm_stats=None, norm_affine=None, norm_eps: float = 1e-3,
                      flat_output: bool = False,
                      interpret: bool = False) -> jax.Array:
    """(B, S, C) slot table + (B, S) ascending cell ids -> (B, H, W, C).

    ``cells`` must be ascending per sample (the stream pillarizer's slot
    order; duplicates are allowed as long as every duplicate's table row
    beyond the first is all-zero — the selection matmul ADDS matching rows).
    ``valid=None`` means the cells already carry their sentinels; otherwise
    invalid slots are mapped to the ``H*W`` sentinel here. Slot count S is
    unbounded (dense 32k pillar tables and 131k per-point stream slots both
    work); each canvas block dynamically scans exactly its own slot range.

    ``norm_stats``/``norm_affine``: optional fused pseudo-image LayerNorm
    epilogue (eval path) — stats = per-sample (mean (B,), var (B,)), affine
    = (scale, bias) of shape (H, W, C) (full mode) or broadcastable (1, 1, C)
    (channel mode). Writing the NORMALIZED canvas directly saves one full
    canvas HBM round trip vs a separate norm op.
    """
    h, w = grid_hw
    b, p, c = table.shape
    # batch-minor output stores slice the lane axis at offset b*C, which
    # Mosaic only accepts when the offset is 128-aligned (interpret mode
    # has no such constraint, so small-C tests stay valid)
    assert interpret or c % 128 == 0, (
        f"canvas_from_table on TPU needs C % 128 == 0, got C={c}")
    if rows_per_block <= 0:
        rows_per_block = pick_rows_per_block(h, w, slots=p)
        assert rows_per_block, (h, w)
    assert (h % rows_per_block) == 0, (h, rows_per_block)
    assert (rows_per_block * w) % 8 == 0, (rows_per_block, w)
    nblocks = h // rows_per_block
    rw = rows_per_block * w
    sub = 384  # slots per chunk: 3 full lanes, MXU-friendly contraction dim

    if valid is not None:
        cells = jnp.where(valid, cells, h * w)
    cells = cells.astype(jnp.int32)
    # lo[blk] = first slot of block blk; lo[nblocks] = end of valid slots
    boundaries = (jnp.arange(nblocks + 1, dtype=jnp.int32) * rw)
    lo = jax.vmap(lambda cl: jnp.searchsorted(cl, boundaries, side="left")
                  .astype(jnp.int32))(cells)

    # pad slots so the last (128-floor + rounded-up) chunk DMA stays in
    # bounds; sentinel cells never match. cells ship as (B, 1, S+pad):
    # integer-indexing the batch dim keeps the sliced dims (1, sub)
    # lane-aligned for the DMA (Mosaic rejects sublane slices of size 1).
    # pre_padded: the producer already wrote >= sub+128 sentinel tail slots
    # (zero features, H*W cells) — skip the 67 MB pad copy
    if pre_padded:
        table_p, cells_p = table, cells[:, None, :]
    else:
        pad = sub + 128
        pad_cols = [(0, 0), (0, pad)]
        table_p = jnp.pad(table, pad_cols + [(0, 0)])
        cells_p = jnp.pad(cells, pad_cols, constant_values=h * w + 1)[:, None, :]

    norm = norm_stats is not None
    kernel = functools.partial(
        _canvas_kernel, rows_per_block=rows_per_block, width=w, sub=sub,
        norm=norm, eps=norm_eps)
    in_specs = [
        # full (B, nblocks+1) scalar array in SMEM
        pl.BlockSpec((b, nblocks + 1), lambda blk, bi: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
    ]
    inputs = [lo, table_p, cells_p]
    if norm:
        mean, var = norm_stats
        stats = jnp.stack([mean, var], axis=-1).astype(jnp.float32)  # (B, 2)
        in_specs.insert(1, pl.BlockSpec((b, 2), lambda blk, bi: (0, 0),
                                        memory_space=pltpu.SMEM))
        inputs.insert(1, stats)
        for arr in norm_affine:  # (scale, bias), shipped separately (no
            # stacked copy of the 128 MB full-mode affines)
            # shipped in storage dtype (kernel casts blocks to f32): a host
            # astype here would copy the 128 MB full-mode affine per forward
            if arr.size == c:  # channel mode: (1, 1, C) broadcast slab
                inputs.append(arr.reshape(1, 1, c))
                in_specs.append(pl.BlockSpec(
                    (1, 1, c), lambda blk, bi: (0, 0, 0),
                    memory_space=pltpu.VMEM))
            else:  # full mode: (H*W, C), one (rw, C) slab per block — the
                # batch-innermost grid order makes Pallas fetch it once per
                # BLOCK, not once per (block, sample)
                inputs.append(arr.reshape(1, h * w, c))
                in_specs.append(pl.BlockSpec(
                    (1, rw, c), lambda blk, bi: (0, blk, 0),
                    memory_space=pltpu.VMEM))

    if flat_output:
        out_specs = pl.BlockSpec((rw, b * c), lambda blk, bi: (blk, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((h * w, b * c), table.dtype)
    else:
        out_specs = pl.BlockSpec(
            (1, rows_per_block, w, c), lambda blk, bi: (bi, blk, 0, 0),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, h, w, c), table.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(nblocks, b),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, sub, c), table.dtype),
            pltpu.VMEM((2, 1, sub), jnp.int32),
            pltpu.VMEM((sub, c), table.dtype),    # chunk-0 prefetch (table)
            pltpu.VMEM((1, sub), jnp.int32),      # chunk-0 prefetch (cells)
            pltpu.VMEM((rw, c), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    # flat_output: batch-minor (H*W, B*C) for consumers that read it
    # natively (ops/pallas_patch_embed.py); otherwise the kernel already
    # wrote standard NHWC
    return out
