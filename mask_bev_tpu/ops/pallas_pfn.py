"""Fused pillar-feature-net Pallas kernel (TPU inference fast path).

Replaces the XLA stream PFN (``models/encoder.py``) for eval: one kernel
computes, per tile of the sorted point stream, the full decoration (cluster
mean via windowed segmented sums), all PFN layers (linear -> folded-BN ->
relu) and the windowed segmented max-pools — entirely in VMEM. The XLA
version streams (B, N, C) buffers through HBM once per doubling step
(~30 ms/batch-8 on v5e); here the stream is read from HBM exactly once and
only the final per-row pooled features are written back (bf16).

Layout — everything is CHANNEL-MAJOR (C, span): the stream ships as ONE
transposed (B, 8, N) f32 array (point columns on sublanes, stream position
on lanes; x, y, z, intensity, pillar id and kept flag as f32 columns — pids
< 2^24 are exact in f32) and stays in that orientation all the way through
the kernel. This is the difference between ~14 and ~7 ms/batch-8: in
row-major (span, C) form the windowed segmented reductions run on (1280, 4)
/ (1280, 1) arrays that occupy 4 of 128 lanes (every roll is a 160-tile
sublane shuffle at ~3 % lane efficiency), while channel-major keeps all 128
lanes busy and turns the rolls into native lane rotates. The derived
decoration columns (distance, pillar-center x/y) are computed IN-KERNEL
from xyz + pid, halving the packed HBM traffic vs shipping them; the
per-layer matmuls run transposed (W^T @ x). Tiles overlap by a lane-aligned
halo >= K so the central T rows of each tile are exact; the overlapping
windows are expressed as ``span/128`` separate 128-lane BlockSpec loads
(same trick as ``pallas_swin_block``), which Pallas double-buffers against
compute.

Equivalence with the XLA path is tested in ``tests/test_pallas_pfn.py``
(interpret mode on CPU, compiled on TPU). Semantics match mmdet3d's
PillarFeatureNet via the stream formulation — see ``ops/stream_pillars.py``
(reference ``mask_bev_encoders.py:69-92``).
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll_lanes(v, s: int):
    """Circular out[:, i] = v[:, (i+s) mod L] along the lane axis.

    Mosaic's DYNAMIC rotate is 32-bit-only ("Rotate with non-32-bit data"),
    so 16-bit arrays take jnp.roll — the shift is static, and the static
    lowering compiles (probed on the target libtpu) and is exact."""
    if v.dtype.itemsize == 2:
        return jnp.roll(v, -s, axis=1)
    return pltpu.roll(v, (-s) % v.shape[1], 1)


def _shift_pid(pid, s: int):
    """out[:, i] = pid[:, i+s] with -1 at the edges. Only the pid shift
    needs the edge fill: every VALUE shift is gated by pid equality, so
    circularly wrapped garbage lanes are masked out by the -1-filled pid."""
    if s == 0:
        return pid
    l = pid.shape[1]
    rolled = _roll_lanes(pid, s)
    lanes = jax.lax.broadcasted_iota(jnp.int32, pid.shape, 1)
    valid = (lanes + s >= 0) & (lanes + s < l)
    return jnp.where(valid, rolled, -1.0)


def _win_max(z, pid, k: int, symmetric: bool):
    """Windowed segmented max over contiguous same-pid runs (reach k-1).
    z (C, span) pre-masked >= 0 for non-contributing lanes."""
    out = z
    s = 1
    while s < k:
        for sign in ((1, -1) if symmetric else (1,)):
            sh = s * sign
            gate = _shift_pid(pid, sh) == pid
            out = jnp.maximum(out, jnp.where(gate, _roll_lanes(out, sh), z))
        s *= 2
    return out


def _win_sum_dir(w, pid, k: int, sign: int):
    out = w
    s = 1
    while s < k:
        sh = s * sign
        gate = _shift_pid(pid, sh) == pid
        out = out + jnp.where(gate, _roll_lanes(out, sh), 0.0)
        s *= 2
    return out


def _prefix_max(v, fill):
    """Inclusive prefix max along the lane axis: out[:, i] = max(v[:, :i+1])."""
    out = v
    s = 1
    while s < out.shape[1]:
        out = jnp.maximum(out, _shift_fill(out, -s, fill))
        s *= 2
    return out


def _shift_fill(v, s: int, fill):
    """out[:, i] = v[:, i+s] with ``fill`` at the edges (lane roll + iota gate)."""
    if s == 0:
        return v
    l = v.shape[1]
    rolled = _roll_lanes(v, s)
    lanes = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    valid = (lanes + s >= 0) & (lanes + s < l)
    return jnp.where(valid, rolled, fill)


# packed column indices in the (B, 8, N) stream
_PID_COL, _KEPT_COL = 4, 5


def _pfn_kernel(*args, n_layers: int, k: int, point_dim: int,
                with_distance: bool, nloads: int, grid_w: int,
                voxel_size: float, x0: float, y0: float):
    """args = x_load refs (nloads), [Wt_i, g_i, b_i] * n_layers, out_ref."""
    x_refs = args[:nloads]
    weights = args[nloads: nloads + 3 * n_layers]
    out_ref = args[nloads + 3 * n_layers]

    p = jnp.concatenate([r[0] for r in x_refs], axis=1)  # (8, span)
    span = p.shape[1]
    pid = p[_PID_COL:_PID_COL + 1, :]      # (1, span) f32 ids (< 2^24)
    kept = p[_KEPT_COL:_KEPT_COL + 1, :]   # (1, span) {0.0, 1.0}

    xyz = p[0:3, :]
    # cluster mean over kept lanes: fwd + bwd windowed sums - self
    w4 = jnp.concatenate([xyz, jnp.ones((1, span), p.dtype)], axis=0) * kept
    sums = (_win_sum_dir(w4, pid, k, 1) + _win_sum_dir(w4, pid, k, -1) - w4)
    mean = sums[0:3, :] / jnp.maximum(sums[3:4, :], 1.0)

    # pillar-center offsets derived from the pillar id (garbage at pid=-1
    # padding lanes, but those are zeroed by the kept gate below)
    row = jnp.floor(pid * (1.0 / grid_w))
    cx = (pid - row * grid_w) * voxel_size + (x0 + 0.5 * voxel_size)
    cy = row * voxel_size + (y0 + 0.5 * voxel_size)
    f_center = p[0:2, :] - jnp.concatenate([cx, cy], axis=0)

    parts = [p[0:point_dim, :], xyz - mean, f_center]
    if with_distance:
        d2 = jnp.sum(xyz * xyz, axis=0, keepdims=True)
        parts.append(jnp.sqrt(d2))
    x = jnp.concatenate(parts, axis=0) * kept   # (C_in, span)

    for li in range(n_layers):
        wt, g, bias = weights[3 * li: 3 * li + 3]   # (out, in), (out,1), (out,1)
        # dot in the weights' NATIVE dtype: bf16 params (compute_dtype) hit
        # the bf16 MXU (~4x the f32 matmul rate); f32 params stay exact
        y = jnp.dot(wt[...], x.astype(wt.dtype),
                    preferred_element_type=jnp.float32)
        z = jnp.maximum(y * g[...] + bias[...], 0.0) * kept
        last = li == n_layers - 1
        pooled = _win_max(z, pid, k, symmetric=not last)
        x = pooled if last else jnp.concatenate([z, pooled], axis=0)

    tile = out_ref.shape[1]
    halo = (span - tile) // 2
    # one relayout per tile: (C_out, tile) -> row-major output table
    out_ref[0] = jnp.transpose(
        x[:, halo: halo + tile], (1, 0)).astype(out_ref.dtype)


def fused_stream_pfn(
    pts: jax.Array,          # (B, N, D) sorted by pillar id
    pid: jax.Array,          # (B, N) int32
    kept: jax.Array,         # (B, N) bool
    weights: List[Tuple[jax.Array, jax.Array, jax.Array]],
    *, point_dim: int, with_distance: bool, k: int, grid_w: int,
    voxel_size: float, x0: float, y0: float,
    tile: int = 1024, interpret: bool = False,
) -> jax.Array:
    """(B, N, C_last) per-row pooled features (read at segment starts)."""
    bsz, n, d = pts.shape
    assert tile % 128 == 0, tile
    halo = ((k + 127) // 128) * 128  # >= k and lane-aligned block loads
    n_pad = ((n + tile - 1) // tile) * tile

    # packed per-point columns x y z inten pid kept (+2 pad sublanes), built
    # DIRECTLY in the transposed (B, 8, N) layout (stack on axis 1)
    f32 = jnp.float32
    x_c = pts[..., 0].astype(f32)
    y_c = pts[..., 1].astype(f32)
    z_c = pts[..., 2].astype(f32)
    inten = (pts[..., 3].astype(f32) if d >= 4
             else jnp.zeros(pts.shape[:2], f32))
    pidf = pid.astype(f32)
    zero = jnp.zeros(pts.shape[:2], f32)
    cols = [x_c, y_c, z_c, inten, pidf, kept.astype(f32), zero, zero]
    p8 = jnp.stack(cols, axis=1)  # (B, 8, N)
    p8 = jnp.pad(p8, [(0, 0), (0, 0), (halo, halo + (n_pad - n))],
                 constant_values=0.0)
    # padding lanes must never join a real segment: pid col -> -1 there
    npad_total = halo + n_pad + halo
    lane = jnp.arange(npad_total)
    in_real = (lane >= halo) & (lane < halo + n)
    p8 = p8.at[:, _PID_COL, :].set(
        jnp.where(in_real[None], p8[:, _PID_COL, :], -1.0))

    n_layers = len(weights)
    c_out = weights[-1][0].shape[1]
    span = tile + 2 * halo
    nloads = span // 128
    tile_blocks = tile // 128

    # overlapping spans as nloads separate 128-lane block loads: Pallas
    # double-buffers them against compute (no manual DMA stall per tile)
    in_specs = [
        pl.BlockSpec((1, 8, 128),
                     lambda b, i, j=j: (b, 0, i * tile_blocks + j),
                     memory_space=pltpu.VMEM)
        for j in range(nloads)
    ]
    w_args = []
    for (w, g, bias) in weights:
        # kernels ship in their native dtype (bf16 under compute_dtype) so
        # the in-kernel dot runs on the bf16 MXU; BN affine stays f32
        w_args += [w.T, g.astype(f32)[:, None],
                   bias.astype(f32)[:, None]]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3

    kernel = functools.partial(
        _pfn_kernel, n_layers=n_layers, k=k, point_dim=point_dim,
        with_distance=with_distance, nloads=nloads, grid_w=grid_w,
        voxel_size=voxel_size, x0=x0, y0=y0)

    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_pad // tile),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, c_out), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n_pad, c_out), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*([p8] * nloads + w_args))
    return out[:, :n]


# ---------------------------------------------------------------------------
# v2: slot-form kernel — the whole eval pillar directory lives in-kernel.
#
# The round-3 eval path paid ~10 ms/b8 of XLA glue around the kernel: the
# pillar directory (kept/is_first/cumsum/starts-sort ~3.8 ms), a 262k-row
# gather compacting the stream to the 32k pillar table (~3.4 ms), the norm
# stats pass (~1.2 ms) and pad/copy packing (~1.2 ms). This kernel removes
# ALL of it by changing the contract with the canvas kernel: instead of a
# dense pillar table it emits one slot PER SORTED POINT —
#
#   feats: (B, N, C) bf16 — last-layer pooled features at segment-START rows,
#          exact zeros elsewhere;
#   cells: ascending per-slot cell ids where non-start rows DUPLICATE the
#          last start's cell (their zero feature rows add nothing in the
#          canvas selection matmul) and the out-of-range tail gets the H*W
#          sentinel. Ascending order is what the canvas kernel's per-block
#          searchsorted needs; duplicates are harmless by linearity.
#
# kept/is_first come from in-kernel pid lane-rolls (the halo >= K provides
# the lookback); the dup-fill is an in-kernel prefix max with a scalar SMEM
# carry across the sequential grid (runs longer than the halo span tiles);
# per-tile norm-stat partial sums ride spare sublanes of the cells output.
# The eval path thus shrinks to: pid fusion -> lax.sort -> (B,8,N) stack ->
# this kernel -> canvas kernel. The max_pillars cap disappears from eval —
# closer to the reference, whose max_voxels equals the full grid (SURVEY
# §2.1; reference mask_bev_encoders.py:69).
# ---------------------------------------------------------------------------


def _pfn_slots_kernel(*args, n_layers: int, k: int, point_dim: int,
                      with_distance: bool, nloads: int, grid_w: int,
                      n_cells: int, n_real: int, tile: int, halo: int,
                      voxel_size: float, x0: float, y0: float,
                      pool_bf16: bool = False):
    """args = 5 * nloads column load refs (x y z inten pid, each column as
    nloads (1, 128) blocks), [Wt_i, g_i, b_i] * n_layers,
    feat_ref, cells_ref, carry_ref."""
    x_refs = args[:5 * nloads]
    weights = args[5 * nloads: 5 * nloads + 3 * n_layers]
    feat_ref, cells_ref, carry_ref = args[5 * nloads + 3 * n_layers:]

    t = pl.program_id(1)
    # each column arrives as its own lane-contiguous block stream (no
    # channel-major (B, 8, N) stack exists anywhere — its strided write
    # cost ~1.5 ms/b8)
    colv = [jnp.concatenate([x_refs[c * nloads + j][0]
                             for j in range(nloads)], axis=1)
            for c in range(5)]  # 5 x (1, span)
    span = colv[0].shape[1]
    f32 = jnp.float32

    # clamped block loads re-read interior blocks at the array edges; mask
    # the pid of lanes outside [0, n_real) so edge garbage never joins (or
    # splits) a segment
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, span), 1)
    gpos = t * tile + lanes - halo
    in_arr = (gpos >= 0) & (gpos < n_real)
    pid = jnp.where(in_arr, colv[4], -1.0)  # (1, span)

    sent = f32(n_cells)
    is_real = (pid >= 0.0) & (pid < sent)
    # rank-within-run < K  <=>  the row K back belongs to a different run
    kept = (is_real & (_shift_fill(pid, -k, -1.0) != pid)).astype(f32)
    is_first = is_real & (_shift_fill(pid, -1, -1.0) != pid)
    firstf = is_first.astype(f32)

    xyz = jnp.concatenate(colv[0:3], axis=0)  # (3, span)
    # cluster mean over kept lanes: fwd + bwd windowed sums - self
    w4 = jnp.concatenate([xyz, jnp.ones((1, span), xyz.dtype)],
                         axis=0) * kept
    sums = (_win_sum_dir(w4, pid, k, 1) + _win_sum_dir(w4, pid, k, -1) - w4)
    mean = sums[0:3, :] / jnp.maximum(sums[3:4, :], 1.0)

    row = jnp.floor(pid * (1.0 / grid_w))
    cx = (pid - row * grid_w) * voxel_size + (x0 + 0.5 * voxel_size)
    cy = row * voxel_size + (y0 + 0.5 * voxel_size)
    f_center = (jnp.concatenate(colv[0:2], axis=0)
                - jnp.concatenate([cx, cy], axis=0))

    parts = [jnp.concatenate(colv[0:point_dim], axis=0), xyz - mean,
             f_center]
    if with_distance:
        d2 = jnp.sum(xyz * xyz, axis=0, keepdims=True)
        parts.append(jnp.sqrt(d2))
    x = jnp.concatenate(parts, axis=0) * kept   # (C_in, span)

    for li in range(n_layers):
        wt, g, bias = weights[3 * li: 3 * li + 3]
        # native-dtype dot: bf16 weights hit the bf16 MXU (see _pfn_kernel)
        y = jnp.dot(wt[...], x.astype(wt.dtype),
                    preferred_element_type=jnp.float32)
        z = jnp.maximum(y * g[...] + bias[...], 0.0) * kept
        if pool_bf16:
            # pool in bf16: the windowed max is the kernel's VPU bottleneck
            # (25 gated lane-roll passes over (C, span)); halving the element
            # width halves the vreg traffic. EXACT vs pooling f32 then
            # rounding: round-to-nearest is monotone, so
            # max(bf16(x_i)) == bf16(max(x_i)), and the downstream consumers
            # (next layer's dot in bf16 weights, the bf16 feature table)
            # already round these values identically.
            z = z.astype(jnp.bfloat16)
        last = li == n_layers - 1
        pooled = _win_max(z, pid, k, symmetric=not last)
        x = pooled if last else jnp.concatenate([z, pooled], axis=0)

    c_out = x.shape[0]
    pooled_g = x * firstf.astype(x.dtype)       # (C, span)

    # ascending dup-filled cells: prefix max of start cells, combined with
    # the carry (history older than this tile's halo — runs can outspan it)
    pm = _prefix_max(jnp.where(is_first, pid, -1.0), -1.0)
    carry = jnp.where(t == 0, 0.0, carry_ref[0])
    cells = jnp.maximum(jnp.maximum(pm, carry), 0.0)
    # out-of-range tail (pid == sentinel) and edge padding -> H*W sentinel
    cells = jnp.where((pid >= sent) | (pid < 0.0), sent, cells)

    ctr = slice(halo, halo + tile)
    carry_ref[0] = jnp.maximum(pm, carry)[0, halo + tile - 1]

    # per-tile norm-stat partials over the bf16-ROUNDED written values (the
    # canvas consumes the bf16 table; stats must describe what it sums)
    wrt = pooled_g[:, ctr].astype(feat_ref.dtype)
    feat_ref[0] = jnp.transpose(wrt, (1, 0))
    w32 = wrt.astype(f32)
    st = jnp.concatenate(
        [jnp.sum(w32, axis=1, keepdims=True),
         jnp.sum(w32 * w32, axis=1, keepdims=True)], axis=1)  # (C, 2)
    st8 = jnp.pad(jnp.transpose(st, (1, 0)), ((0, 0), (0, tile - c_out)))
    cells_ref[0] = jnp.concatenate(
        [cells[:, ctr], st8, jnp.zeros((5, tile), f32)], axis=0)  # (8, tile)


def slots_pad_len(n: int, canvas_pad: int, tile: int = 4096) -> int:
    """Padded slot-stream length :func:`fused_stream_pfn_slots` would use —
    pass to ``pillarize_stream_packed(pad_to=...)`` so the sentinel tail is
    written during the pack itself (then call with ``pre_padded=True``)."""
    return ((n + canvas_pad + tile - 1) // tile) * tile


def fused_stream_pfn_slots(
    cols,  # 5 x (B, N) f32: x, y, z, intensity, pid — pid-sorted streams
    weights: List[Tuple[jax.Array, jax.Array, jax.Array]],
    *, point_dim: int, with_distance: bool, k: int, grid_w: int,
    grid_h: int, voxel_size: float, x0: float, y0: float,
    tile: int = 4096, canvas_pad: int = 0,
    pre_padded: bool = False, pool_bf16=None, interpret: bool = False,
):
    """Sorted column streams -> (feats (B,N,C) bf16, cells (B,N) f32,
    stats (B,2,C) f32 [sum, sumsq] over the written feature rows).

    See the module comment above ``_pfn_slots_kernel`` for the slot-form
    contract; feed ``feats``/``cells`` straight to
    ``pallas_canvas.canvas_from_table(..., valid=None)``. With
    ``canvas_pad > 0`` the outputs keep >= that many sentinel tail slots
    (zero features, H*W cells) so the canvas kernel can use them directly
    with ``pre_padded=True`` — skipping its own 67 MB ``jnp.pad`` copy.

    Each column arrives as its own (B, N) array (the lane-contiguous block
    loads need no stacking — a channel-major (B, 8, N) stack costs a
    sublane-strided write, measured ~1.5 ms/b8).
    """
    cols = list(cols)
    assert len(cols) == 5, len(cols)
    bsz, n = cols[0].shape
    assert tile % 128 == 0, tile
    if pre_padded:
        # the producer already wrote the sentinel tail (zero features,
        # sentinel pid) as part of the pack — see slots_pad_len
        assert n % tile == 0, (n, tile)
        n_pad = n
    else:
        n_pad = ((n + canvas_pad + tile - 1) // tile) * tile
        if n_pad != n:
            # pad lanes sit beyond n_real: the kernel masks their pid to -1,
            # so they pool to zero features and sentinel cells
            cols = [jnp.pad(c, [(0, 0), (0, n_pad - n)]) for c in cols]
    # kept at lane L needs a K-lane lookback, and the decorations reach K-1
    # lanes back from the first central lane, so the halo must cover 2K-1
    # lanes. Mixed block sizes keep it TIGHT: each column loads its tile as
    # ONE (1, 1, tile) block plus hb 128-lane blocks per side — at the
    # flagship K=32 that is span = tile + 256 instead of the former
    # block_l-rounded tile + 1024 (25% of every windowed VPU op was halo
    # re-compute), and 3 DMAs/column instead of 10.
    hb = (max(2 * k - 1, 1) + 127) // 128
    halo = hb * 128
    n_layers = len(weights)
    c_out = weights[-1][0].shape[1]
    assert c_out <= tile, (c_out, tile)
    nloads = 2 * hb + 1
    t128 = tile // 128
    nblk128 = n_pad // 128

    f32 = jnp.float32
    # the (B, 1, N) view keeps Mosaic's sublane-divisibility rule happy (a
    # (1, 128) block on a (B, N) array has an illegal 1-sublane block);
    # clamped edge loads re-read interior lanes, masked by gpos in-kernel
    cols = [c.reshape(bsz, 1, n_pad) for c in cols]
    in_specs = []
    for _c in range(5):
        for j in range(hb):       # left halo, 128-lane units
            in_specs.append(pl.BlockSpec(
                (1, 1, 128),
                lambda b, i, j=j: (
                    b, 0, jnp.clip(i * t128 - hb + j, 0, nblk128 - 1)),
                memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(  # central tile, one DMA
            (1, 1, tile), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM))
        for j in range(hb):       # right halo
            in_specs.append(pl.BlockSpec(
                (1, 1, 128),
                lambda b, i, j=j: (
                    b, 0, jnp.clip((i + 1) * t128 + j, 0, nblk128 - 1)),
                memory_space=pltpu.VMEM))
    w_args = []
    for (w, g, bias) in weights:
        # native dtype (see fused_stream_pfn): bf16 weights -> bf16 MXU
        w_args += [w.T, g.astype(f32)[:, None],
                   bias.astype(f32)[:, None]]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3

    if pool_bf16 is None:
        # auto: bf16 pooling is value-exact only when every consumer of the
        # pooled features already rounds to bf16 — i.e. bf16 layer weights.
        # Gated on MASKBEV_PFN_POOL_BF16=1 until the Mosaic lowering of the
        # packed-lane roll is verified on the target libtpu (plain
        # pltpu.roll on bf16 is rejected: "Rotate with non-32-bit data").
        import os
        pool_bf16 = (all(w.dtype == jnp.bfloat16 for (w, _, _) in weights)
                     and os.environ.get("MASKBEV_PFN_POOL_BF16", "0") == "1")
    kernel = functools.partial(
        _pfn_slots_kernel, n_layers=n_layers, k=k, point_dim=point_dim,
        with_distance=with_distance, nloads=nloads, grid_w=grid_w,
        n_cells=grid_h * grid_w, n_real=n, tile=tile, halo=halo,
        voxel_size=voxel_size, x0=x0, y0=y0, pool_bf16=bool(pool_bf16))

    feats, cells8 = pl.pallas_call(
        kernel,
        grid=(bsz, n_pad // tile),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, tile, c_out), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n_pad, c_out), jnp.bfloat16),
            jax.ShapeDtypeStruct((bsz, 8, n_pad), f32),
        ],
        scratch_shapes=[pltpu.SMEM((1,), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*([c for c in cols for _ in range(nloads)] + w_args))

    keep = n_pad if canvas_pad else n
    cells = cells8[:, 0, :keep]
    stats = cells8[:, 1:3, :].reshape(bsz, 2, n_pad // tile, tile)[
        ..., :c_out].sum(axis=2)  # (B, 2, C)
    return feats[:, :keep], cells, stats
