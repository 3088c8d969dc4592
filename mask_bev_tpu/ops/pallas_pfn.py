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
    """Circular out[:, i] = v[:, (i+s) mod L] along the lane axis (native
    lane rotate; Mosaic's rotate is 32-bit-only, so windowed ops stay f32)."""
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
        y = jnp.dot(wt[...], x, preferred_element_type=jnp.float32)
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
        w_args += [w.astype(f32).T, g.astype(f32)[:, None],
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
