"""Fixed-capacity point-cloud pillarization (TPU-native voxelization).

Replaces the reference's dynamic-shape CUDA hard voxelizer
(``mmcv.ops.Voxelization`` used at reference ``mask_bev_encoders.py:69,100``
with ``max_num_points=32``, ``max_voxels=(500*500,)*2``, ``deterministic=True``)
with a static-shape jnp pipeline suitable for jit/pjit on TPU:

  points (N, D) + valid mask
    -> per-point pillar id (out-of-range -> sentinel)
    -> stable sort by pillar id (keeps original point order within a pillar,
       matching the deterministic truncation semantics of the reference)
    -> segment ranks + compacted pillar slots
    -> scatter into (P, K, D) padded pillar buffer

Semantics deliberately preserved:
  * at most K points per pillar, keeping the FIRST K in input order;
  * at most P pillars (overflow pillars dropped);
  * out-of-range points dropped (the reference range-filters before
    voxelizing, ``mask_bev_encoders.py:113-117``).

Deviation (documented): when more than P distinct pillars exist, the
reference keeps pillars in first-appearance order while we keep them in
ascending-cell-id order. Real scans produce ~6-30k pillars vs the 250k cap,
so the clip never fires in practice.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp


class PillarBatch(NamedTuple):
    """Static-shape pillarized point cloud.

    feats:      (P, K, D) float — raw per-point features, zero-padded
    num_points: (P,) int32 — valid points per pillar (<= K)
    coords:     (P, 2) int32 — (iy, ix) BEV cell of each pillar; (-1,-1) if invalid
    valid:      (P,) bool — pillar occupancy mask
    """

    feats: jax.Array
    num_points: jax.Array
    coords: jax.Array
    valid: jax.Array


def pillarize(
    points: jax.Array,
    valid: jax.Array,
    *,
    x_range: Tuple[float, float],
    y_range: Tuple[float, float],
    z_range: Tuple[float, float],
    voxel_size: float,
    max_points_per_pillar: int,
    max_pillars: int,
) -> PillarBatch:
    """Pillarize one padded point cloud. All shapes static; jit/vmap friendly.

    Args:
      points: (N, D) with columns [x, y, z, ...features]; padded rows arbitrary.
      valid:  (N,) bool mask of real points.
    """
    n = points.shape[0]
    k = max_points_per_pillar
    p = max_pillars
    x, y, z = points[:, 0], points[:, 1], points[:, 2]

    grid_w = int(round((x_range[1] - x_range[0]) / voxel_size))
    grid_h = int(round((y_range[1] - y_range[0]) / voxel_size))
    sentinel = grid_h * grid_w  # one past the last cell id

    in_range = (
        (x >= x_range[0]) & (x < x_range[1])
        & (y >= y_range[0]) & (y < y_range[1])
        & (z >= z_range[0]) & (z < z_range[1])
        & valid
    )
    ix = jnp.clip(jnp.floor((x - x_range[0]) / voxel_size).astype(jnp.int32), 0, grid_w - 1)
    iy = jnp.clip(jnp.floor((y - y_range[0]) / voxel_size).astype(jnp.int32), 0, grid_h - 1)
    pid = jnp.where(in_range, iy * grid_w + ix, sentinel)

    # Stable sort keeps original input order within each pillar, so the
    # K-point truncation below keeps the FIRST K points of each pillar —
    # identical to the reference's deterministic hard voxelizer.
    #
    # TPU cost model (measured on v5e, batch 8 x 131k points): sorts ~5ms,
    # vmapped dynamic_slice ~29ms, row gathers ~10ns/row, HBM scatters
    # ~3M update-rows/s (46ms per 131k-row scatter), jnp.searchsorted with
    # dense queries catastrophic (40-240ms). The construction below is
    # therefore: two argsorts + dynamic slices + tiny gathers — no
    # scatters, no searchsorted.
    arange_n = jnp.arange(n, dtype=jnp.int32)
    order = jnp.argsort(pid, stable=True)
    pid_s = pid[order]
    pts_s = points[order]

    is_first = jnp.concatenate([jnp.ones((1,), bool), pid_s[1:] != pid_s[:-1]])
    is_first &= pid_s < sentinel
    num_segments = is_first.sum()

    # start position of pillar slot s = position of the s-th True in
    # is_first: one more (cheap) sort replaces a (slow) searchsorted
    start_keys = jnp.where(is_first, arange_n, n)
    starts_all = jnp.sort(start_keys)  # ascending: real starts first
    if n >= p + 1:
        starts_ext = starts_all[: p + 1]
    else:  # fewer points than pillar slots
        starts_ext = jnp.concatenate(
            [starts_all, jnp.full((p + 1 - n,), n, jnp.int32)])
    starts = starts_ext[:p]
    pillar_valid = jnp.arange(p) < jnp.minimum(num_segments, p)

    num_valid_pts = jnp.sum(pid < sentinel)  # in-range point count
    # a slot's segment ends where the NEXT segment starts (so the last slot
    # cannot absorb points of overflow segments beyond the P cap), clipped
    # to the in-range point count
    ends = jnp.minimum(
        jnp.where(pillar_valid, starts_ext[1:], starts), num_valid_pts)
    counts = jnp.maximum(ends - starts, 0)
    num_points = jnp.minimum(counts, k).astype(jnp.int32)

    # (P, K, D) via contiguous dynamic slices from the (zero-padded) sorted
    # sequence; padding keeps near-the-end windows aligned without shifting
    d = points.shape[1]
    pts_pad = jnp.concatenate([pts_s, jnp.zeros((k, d), pts_s.dtype)])
    safe_starts = jnp.where(pillar_valid, starts, 0)
    feats = jax.vmap(
        lambda s: jax.lax.dynamic_slice(pts_pad, (s, jnp.int32(0)), (k, d))
    )(safe_starts)
    point_ok = jnp.arange(k, dtype=jnp.int32)[None, :] < num_points[:, None]
    feats = jnp.where(point_ok[..., None], feats, 0).astype(points.dtype)

    cell = jnp.where(pillar_valid, pid_s[jnp.clip(starts, 0, n - 1)], -1)
    coords = jnp.where(
        pillar_valid[:, None],
        jnp.stack([cell // grid_w, cell % grid_w], axis=-1),
        -1,
    ).astype(jnp.int32)
    return PillarBatch(feats, num_points, coords, pillar_valid & (counts > 0))


def pillarize_batch(
    points: jax.Array,
    valid: jax.Array,
    **kw,
) -> PillarBatch:
    """vmap of :func:`pillarize` over a leading batch dim: (B, N, D), (B, N)."""
    return jax.vmap(lambda pt, v: pillarize(pt, v, **kw))(points, valid)


def pad_points(points_np, max_points: int, point_dim: int):
    """Host-side helper: pad/truncate one (Ni, D) numpy cloud to (max_points, D) + mask."""
    import numpy as np

    n = min(points_np.shape[0], max_points)
    out = np.zeros((max_points, point_dim), np.float32)
    out[:n] = points_np[:n, :point_dim]
    mask = np.zeros((max_points,), bool)
    mask[:n] = True
    return out, mask
