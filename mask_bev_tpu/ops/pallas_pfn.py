"""Fused pillar-feature-net Pallas kernel (TPU inference fast path).

Replaces the XLA stream PFN (``models/encoder.py``) for eval: one kernel
computes, per tile of the sorted point stream, the full decoration (cluster
mean via windowed segmented sums), all PFN layers (linear -> folded-BN ->
relu) and the windowed segmented max-pools — entirely in VMEM. The XLA
version streams (B, N, C) buffers through HBM once per doubling step
(~30 ms/batch-8 on v5e); here the stream is read from HBM exactly once and
only the final per-row pooled features are written back (bf16).

Tiles overlap by a halo on each side (>= K rows, rounded so every DMA slice
is 128-lane aligned — Mosaic rejects narrow-lane sliced copies, so the
streams are stored transposed (B, C, N) and transposed back in VMEM): every
windowed reduction reaches at most K-1 rows, so the central T rows of each
tile are exact. Equivalence with the XLA path is tested in
``tests/test_pallas_pfn.py`` (interpret mode on CPU, compiled on TPU).

Semantics match mmdet3d's PillarFeatureNet via the stream formulation — see
``ops/stream_pillars.py`` (reference ``mask_bev_encoders.py:69-92``).
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_val(v, s: int, fill):
    """out[i] = v[i+s] along axis 0 of a (R, C) value, fill at the edges."""
    if s == 0:
        return v
    r = v.shape[0]
    pad = jnp.full((abs(s),) + v.shape[1:], fill, v.dtype)
    if s > 0:
        return jnp.concatenate([v[s:], pad], axis=0)
    return jnp.concatenate([pad, v[:r + s]], axis=0)


def _win_max(z, pid, k: int, symmetric: bool):
    """Windowed segmented max over contiguous same-pid runs (reach k-1).
    z pre-masked >= 0 for non-contributing rows."""
    out = z
    s = 1
    while s < k:
        for sign in ((1, -1) if symmetric else (1,)):
            sh = s * sign
            gate = _shift_val(pid, sh, -1) == pid
            out = jnp.maximum(out, jnp.where(gate, _shift_val(out, sh, 0.0), z))
        s *= 2
    return out


def _win_sum_dir(w, pid, k: int, sign: int):
    out = w
    s = 1
    while s < k:
        sh = s * sign
        gate = _shift_val(pid, sh, -1) == pid
        out = out + jnp.where(gate, _shift_val(out, sh, 0.0), 0.0)
        s *= 2
    return out


def _pfn_kernel(pts_hbm, pid_hbm, kept_hbm, *args,
                n_layers: int, k: int, point_dim: int, with_distance: bool,
                tile: int, halo: int):
    """args = [W_i, g_i, b_i] * n_layers, out_ref, scratch refs."""
    weights = args[: 3 * n_layers]
    out_ref = args[3 * n_layers]
    pts_s, pid_s, kept_s, sems = args[3 * n_layers + 1:]

    b = pl.program_id(0)
    i = pl.program_id(1)
    span = tile + 2 * halo
    # stream the tile (+halos) from HBM into VMEM; sources are transposed
    # (B, C, N) so the sliced dim is the 128-aligned lane dim
    cp0 = pltpu.make_async_copy(
        pts_hbm.at[b, :, pl.ds(i * tile, span)], pts_s, sems.at[0])
    cp1 = pltpu.make_async_copy(
        pid_hbm.at[b, :, pl.ds(i * tile, span)], pid_s, sems.at[1])
    cp2 = pltpu.make_async_copy(
        kept_hbm.at[b, :, pl.ds(i * tile, span)], kept_s, sems.at[2])
    cp0.start(); cp1.start(); cp2.start()
    cp0.wait(); cp1.wait(); cp2.wait()

    p = jnp.transpose(pts_s[...], (1, 0))    # (span, 8): x y z i dist cx cy _
    pid = jnp.transpose(pid_s[...], (1, 0))  # (span, 1) int32
    kept = jnp.transpose(kept_s[...], (1, 0))  # (span, 1) f32 in {0, 1}

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

    # packed per-point columns: x y z inten dist cx cy pad
    f32 = jnp.float32
    xyz = pts[..., :3].astype(f32)
    inten = (pts[..., 3:4].astype(f32) if d >= 4
             else jnp.zeros(pts.shape[:2] + (1,), f32))
    dist = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    pidf = pid.astype(f32)
    cx = (pid % grid_w).astype(f32) * voxel_size + x0 + 0.5 * voxel_size
    cy = jnp.floor(pidf / grid_w) * voxel_size + y0 + 0.5 * voxel_size
    p8 = jnp.concatenate(
        [xyz, inten, dist, cx[..., None], cy[..., None],
         jnp.zeros(pts.shape[:2] + (1,), f32)], axis=-1)

    def pad_t(a, fill):
        """(B, N, C) -> transposed, padded (B, C, halo + n_pad + halo)."""
        a = jnp.swapaxes(a, 1, 2)
        return jnp.pad(a, [(0, 0), (0, 0), (halo, halo + (n_pad - n))],
                       constant_values=fill)

    p8_t = pad_t(p8, 0.0)
    pid_t = pad_t(pid.astype(jnp.int32)[..., None], -1)
    kept_t = pad_t(kept.astype(f32)[..., None], 0.0)

    n_layers = len(weights)
    c_out = weights[-1][0].shape[1]
    span = tile + 2 * halo

    w_args = []
    in_specs = [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 3
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
            pltpu.VMEM((8, span), f32),
            pltpu.VMEM((1, span), jnp.int32),
            pltpu.VMEM((1, span), f32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(p8_t, pid_t, kept_t, *w_args)
    return out[:, :n]
