"""Fused pillar-feature-net Pallas kernel (TPU inference fast path).

Replaces the XLA stream PFN (``models/encoder.py``) for eval: one kernel
computes, per tile of the sorted point stream, the full decoration (cluster
mean via windowed segmented sums), all PFN layers (linear -> folded-BN ->
relu) and the windowed segmented max-pools — entirely in VMEM. The XLA
version streams (B, N, C) buffers through HBM once per doubling step
(~30 ms/batch-8 on v5e); here the stream is read from HBM exactly once and
only the final per-row pooled features are written back (bf16).

Layout: everything ships as ONE transposed (B, 16, N) f32 array (point
columns on sublanes, stream on lanes) — Mosaic rejects narrow-lane sliced
DMAs, and cross-layout relayouts inside the kernel are expensive, so the
stream is packed once in XLA (including the pillar id and kept flag as f32
columns; pids < 2^24 are exact in f32) and transposed to row form once per
tile. Tiles overlap by a lane-aligned halo >= K: every windowed reduction
reaches at most K-1 rows, so the central T rows of each tile are exact.

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


def _roll_rows(v, s: int):
    """Circular out[i] = v[(i+s) mod R] along axis 0 (sublane rotate —
    Mosaic rejects pad+concat on vectors carrying lane offsets, and rotates
    are cheaper anyway)."""
    return pltpu.roll(v, (-s) % v.shape[0], 0)


def _shift_pid(pid, s: int):
    """out[i] = pid[i+s] with -1 at the edges. Only the pid shift needs the
    edge fill: every VALUE shift is gated by pid equality, so circularly
    wrapped garbage rows are masked out by the -1-filled pid."""
    if s == 0:
        return pid
    r = pid.shape[0]
    rolled = _roll_rows(pid, s)
    rows = jax.lax.broadcasted_iota(jnp.int32, pid.shape, 0)
    valid = (rows + s >= 0) & (rows + s < r)
    return jnp.where(valid, rolled, -1.0)


def _win_max(z, pid, k: int, symmetric: bool):
    """Windowed segmented max over contiguous same-pid runs (reach k-1).
    z pre-masked >= 0 for non-contributing rows."""
    out = z
    s = 1
    while s < k:
        for sign in ((1, -1) if symmetric else (1,)):
            sh = s * sign
            gate = _shift_pid(pid, sh) == pid
            out = jnp.maximum(out, jnp.where(gate, _roll_rows(out, sh), z))
        s *= 2
    return out


def _win_sum_dir(w, pid, k: int, sign: int):
    out = w
    s = 1
    while s < k:
        sh = s * sign
        gate = _shift_pid(pid, sh) == pid
        out = out + jnp.where(gate, _roll_rows(out, sh), 0.0)
        s *= 2
    return out


# packed column indices in the (B, 16, N) stream
_PID_COL, _KEPT_COL = 8, 9


def _pfn_kernel(pts_hbm, *args,
                n_layers: int, k: int, point_dim: int, with_distance: bool,
                tile: int, halo: int):
    """args = [W_i, g_i, b_i] * n_layers, out_ref, scratch refs."""
    weights = args[: 3 * n_layers]
    out_ref = args[3 * n_layers]
    pts_s, sem = args[3 * n_layers + 1:]

    b = pl.program_id(0)
    i = pl.program_id(1)
    span = tile + 2 * halo
    cp = pltpu.make_async_copy(
        pts_hbm.at[b, :, pl.ds(i * tile, span)], pts_s, sem)
    cp.start()
    cp.wait()

    p = jnp.transpose(pts_s[...], (1, 0))  # (span, 16)
    pid = p[:, _PID_COL:_PID_COL + 1]      # f32 ids (exact < 2^24)
    kept = p[:, _KEPT_COL:_KEPT_COL + 1]   # {0.0, 1.0}

    xyz = p[:, 0:3]
    # cluster mean over kept rows: fwd + bwd windowed sums - self
    w4 = jnp.concatenate([xyz, jnp.ones((span, 1), p.dtype)], axis=1) * kept
    sums = (_win_sum_dir(w4, pid, k, 1) + _win_sum_dir(w4, pid, k, -1) - w4)
    mean = sums[:, 0:3] / jnp.maximum(sums[:, 3:4], 1.0)

    parts = [p[:, 0:point_dim], xyz - mean, p[:, 0:2] - p[:, 5:7]]
    if with_distance:
        parts.append(p[:, 4:5])
    x = jnp.concatenate(parts, axis=1) * kept

    for li in range(n_layers):
        w, g, bias = weights[3 * li: 3 * li + 3]
        y = jnp.dot(x, w[...], preferred_element_type=jnp.float32)
        z = jnp.maximum(y * g[...] + bias[...], 0.0) * kept
        last = li == n_layers - 1
        # windowed ops stay f32: Mosaic's sublane rotate is 32-bit only
        pooled = _win_max(z, pid, k, symmetric=not last)
        x = pooled if last else jnp.concatenate([z, pooled], axis=1)

    out_ref[0] = x[halo: halo + tile].astype(out_ref.dtype)


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
    halo = ((k + 127) // 128) * 128  # >= k and lane-aligned DMA slices
    n_pad = ((n + tile - 1) // tile) * tile

    # packed per-point columns x y z inten dist cx cy _ pid kept + pad,
    # built DIRECTLY in the transposed (B, 16, N) layout (stack on axis 1)
    f32 = jnp.float32
    x_c = pts[..., 0].astype(f32)
    y_c = pts[..., 1].astype(f32)
    z_c = pts[..., 2].astype(f32)
    inten = (pts[..., 3].astype(f32) if d >= 4
             else jnp.zeros(pts.shape[:2], f32))
    dist = jnp.sqrt(x_c * x_c + y_c * y_c + z_c * z_c)
    pidf = pid.astype(f32)
    cx = (pid % grid_w).astype(f32) * voxel_size + x0 + 0.5 * voxel_size
    cy = jnp.floor(pidf / grid_w) * voxel_size + y0 + 0.5 * voxel_size
    zero = jnp.zeros(pts.shape[:2], f32)
    cols = [x_c, y_c, z_c, inten, dist, cx, cy, zero,
            pidf, kept.astype(f32)] + [zero] * 6
    p16 = jnp.stack(cols, axis=1)  # (B, 16, N)
    p16 = jnp.pad(p16, [(0, 0), (0, 0), (halo, halo + (n_pad - n))],
                  constant_values=0.0)
    # padding rows must never join a real segment: pid col -> -1 there
    npad_total = halo + n_pad + halo
    lane = jnp.arange(npad_total)
    in_real = (lane >= halo) & (lane < halo + n)
    p16 = p16.at[:, _PID_COL, :].set(
        jnp.where(in_real[None], p16[:, _PID_COL, :], -1.0))

    n_layers = len(weights)
    c_out = weights[-1][0].shape[1]
    span = tile + 2 * halo

    w_args = []
    in_specs = [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
    for (w, g, bias) in weights:
        w_args += [w.astype(f32), g.astype(f32)[None, :],
                   bias.astype(f32)[None, :]]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3

    kernel = functools.partial(
        _pfn_kernel, n_layers=n_layers, k=k, point_dim=point_dim,
        with_distance=with_distance, tile=tile, halo=halo)

    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_pad // tile),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, c_out), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n_pad, c_out), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((16, span), f32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(p16, *w_args)
    return out[:, :n]
