"""Stream-form pillarization: sorted point streams + windowed segment reductions.

TPU-native replacement for the (P, K, D) padded-pillar formulation of hard
voxelization + PillarFeatureNet (reference ``mask_bev_encoders.py:69-92``,
``mmcv.ops.Voxelization`` + ``mmdet3d.PillarFeatureNet``). Key observation:
after a stable sort by pillar id, each pillar's points form a contiguous run,
and the reference's deterministic truncation keeps the FIRST ``K`` rows of
each run. Every per-pillar quantity the pillar feature net needs —

  * the kept/dropped decision (rank < K),
  * the cluster mean of the kept points,
  * the max-pooled feature broadcast back to each point,

is therefore a *windowed* segmented reduction with reach at most K-1 rows,
computable with ceil(log2 K) doubling steps of shifted, pid-gated elementwise
ops. No (P, K, D) buffer is ever materialized: the hot path is a handful of
vectorized passes over the sorted (N, C) stream — ideal for the VPU and for
a VMEM-resident Pallas kernel (see ``ops/pallas_pfn.py``).

Semantics preserved from :mod:`mask_bev_tpu.ops.voxelize` (and therefore from
the reference): first-K-in-input-order truncation, out-of-range points
dropped, at most P pillars in ascending-cell-id order.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class StreamPillars(NamedTuple):
    """Sorted point stream + pillar directory. All shapes static.

    pts:        (N, D) float — points sorted (stably) by pillar id
    pid:        (N,) int32 — sorted pillar ids; ``sentinel`` for dropped rows
    kept:       (N,) bool — in-range and rank-within-pillar < K
    starts:     (P,) int32 — row index of each pillar's first point
    num_points: (P,) int32 — kept points per pillar (<= K)
    coords:     (P, 2) int32 — (iy, ix) BEV cell; (-1, -1) if invalid
    valid:      (P,) bool — pillar occupancy mask
    """

    pts: jax.Array
    pid: jax.Array
    kept: jax.Array
    starts: jax.Array
    num_points: jax.Array
    coords: jax.Array
    valid: jax.Array


def shift_rows(x: jax.Array, s: int, fill) -> jax.Array:
    """out[..., i, :] = x[..., i+s, :] along axis -2 for >=2D (or -1 for 1D-per-batch).

    Works on (N, ...) or (B, N, ...) arrays where N is ``axis``; out-of-range
    rows are ``fill``.
    """
    return shift_axis(x, s, fill, axis=-2 if x.ndim >= 2 else -1)


def shift_axis(x: jax.Array, s: int, fill, *, axis: int) -> jax.Array:
    if s == 0:
        return x
    axis = axis % x.ndim
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    if s > 0:
        pad[axis] = (0, s)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(s, s + n)
    else:
        pad[axis] = (-s, 0)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, n)
    return jnp.pad(x, pad, constant_values=fill)[tuple(sl)]


def _num_steps(k: int) -> int:
    """Doubling steps so that the window reach 2^t - 1 covers k - 1 rows."""
    return max(0, math.ceil(math.log2(k))) if k > 1 else 0


def windowed_segment_max(
    vals: jax.Array, pid: jax.Array, k: int, *, symmetric: bool = True
) -> jax.Array:
    """Per-row max over same-pid rows within reach k-1 (forward, or both ways).

    vals: (..., N, C) with non-contributing rows pre-masked to a value that is
    a lower bound of real values (the PFN uses 0, exact because post-ReLU
    activations are >= 0). pid: (..., N). Segments must be contiguous runs.

    With ``symmetric=True`` every row of a segment whose kept rows span at
    most k consecutive rows receives the full segment max — this is the
    max-pool *and* its broadcast back to points, in one pass.
    """
    out = vals
    pax = pid.ndim - 1
    for t in range(_num_steps(k)):
        s = 1 << t
        gate = (shift_axis(pid, s, -1, axis=pax) == pid)[..., None]
        out = jnp.maximum(out, jnp.where(gate, shift_rows(out, s, 0), vals))
        if symmetric:
            gate = (shift_axis(pid, -s, -1, axis=pax) == pid)[..., None]
            out = jnp.maximum(out, jnp.where(gate, shift_rows(out, -s, 0), vals))
    return out


def _directional_window_sum(vals, pid, k, sign) -> jax.Array:
    """Exact sum over same-pid rows in [i, i+2^t-1] (sign=+1) or [i-2^t+1, i]
    (sign=-1), with 2^t >= k. Doubling windows are disjoint, so each row is
    counted exactly once."""
    out = vals
    pax = pid.ndim - 1
    for t in range(_num_steps(k)):
        s = (1 << t) * sign
        gate = (shift_axis(pid, s, -1, axis=pax) == pid)[..., None]
        out = out + jnp.where(gate, shift_rows(out, s, 0.0), 0.0)
    return out


def windowed_segment_sum(vals: jax.Array, pid: jax.Array, k: int) -> jax.Array:
    """Per-row sum over ALL same-pid rows within a k-row-span segment.

    vals: (..., N, C) with non-contributing rows pre-masked to 0. Every row i
    gets sum over its segment's rows (which, for kept rows, span at most k
    consecutive rows around i): forward window + backward window - self.
    """
    fwd = _directional_window_sum(vals, pid, k, +1)
    bwd = _directional_window_sum(vals, pid, k, -1)
    return fwd + bwd - vals


def pillarize_stream(
    points: jax.Array,
    valid: jax.Array,
    *,
    x_range: Tuple[float, float],
    y_range: Tuple[float, float],
    z_range: Tuple[float, float],
    voxel_size: float,
    max_points_per_pillar: int,
    max_pillars: int,
) -> StreamPillars:
    """Sort one padded cloud into stream form. Static shapes; jit/vmap friendly.

    Same sort/starts construction as :func:`mask_bev_tpu.ops.voxelize.pillarize`
    (two argsorts, no scatters/searchsorted — see the measured TPU cost model
    there) but without materializing the (P, K, D) buffer.
    """
    n = points.shape[0]
    k = max_points_per_pillar
    p = max_pillars
    x, y, z = points[:, 0], points[:, 1], points[:, 2]

    grid_w = int(round((x_range[1] - x_range[0]) / voxel_size))
    grid_h = int(round((y_range[1] - y_range[0]) / voxel_size))
    sentinel = grid_h * grid_w

    in_range = (
        (x >= x_range[0]) & (x < x_range[1])
        & (y >= y_range[0]) & (y < y_range[1])
        & (z >= z_range[0]) & (z < z_range[1])
        & valid
    )
    ix = jnp.clip(jnp.floor((x - x_range[0]) / voxel_size).astype(jnp.int32), 0, grid_w - 1)
    iy = jnp.clip(jnp.floor((y - y_range[0]) / voxel_size).astype(jnp.int32), 0, grid_h - 1)
    pid = jnp.where(in_range, iy * grid_w + ix, sentinel)

    arange_n = jnp.arange(n, dtype=jnp.int32)
    # multi-operand stable sort: carries the point columns through the sort
    # directly — measured 4x faster than argsort + row gather on v5e
    # (5.1 vs 19.6 ms for 8 x 131k x 4)
    d = points.shape[1]
    sorted_ops = jax.lax.sort(
        [pid] + [points[:, i] for i in range(d)],
        dimension=0, is_stable=True, num_keys=1)
    pid_s = sorted_ops[0]
    pts_s = jnp.stack(sorted_ops[1:], axis=-1)

    # rank-within-run < K  <=>  the row K before belongs to a different run
    kept = (pid_s < sentinel) & (shift_axis(pid_s, -k, -1, axis=0) != pid_s)

    is_first = jnp.concatenate([jnp.ones((1,), bool), pid_s[1:] != pid_s[:-1]])
    is_first &= pid_s < sentinel
    num_segments = is_first.sum()
    # points of overflow segments (beyond the P pillar slots) are dropped,
    # like the reference voxelizer's max_voxels cap drops whole voxels
    seg_idx = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    kept &= seg_idx < p

    start_keys = jnp.where(is_first, arange_n, n)
    starts_all = jnp.sort(start_keys)
    if n >= p + 1:
        starts_ext = starts_all[: p + 1]
    else:
        starts_ext = jnp.concatenate(
            [starts_all, jnp.full((p + 1 - n,), n, jnp.int32)])
    starts = starts_ext[:p]
    pillar_valid = jnp.arange(p) < jnp.minimum(num_segments, p)

    num_valid_pts = jnp.sum(pid < sentinel)
    # a slot's segment ends where the NEXT segment starts (the last slot must
    # not absorb overflow segments beyond the P cap)
    ends = jnp.minimum(
        jnp.where(pillar_valid, starts_ext[1:], starts), num_valid_pts)
    counts = jnp.maximum(ends - starts, 0)
    num_points = jnp.minimum(counts, k).astype(jnp.int32)

    safe_starts = jnp.where(pillar_valid, starts, 0)
    cell = jnp.where(pillar_valid, pid_s[jnp.clip(safe_starts, 0, n - 1)], -1)
    coords = jnp.where(
        pillar_valid[:, None],
        jnp.stack([cell // grid_w, cell % grid_w], axis=-1),
        -1,
    ).astype(jnp.int32)
    return StreamPillars(
        pts_s, pid_s, kept, jnp.where(pillar_valid, starts, n - 1).astype(jnp.int32),
        num_points, coords, pillar_valid & (counts > 0))


def pillarize_stream_batch(points, valid, **kw) -> StreamPillars:
    """vmap of :func:`pillarize_stream`: (B, N, D), (B, N)."""
    return jax.vmap(lambda pt, v: pillarize_stream(pt, v, **kw))(points, valid)


def pillarize_stream_packed(
    points: jax.Array,
    valid: jax.Array,
    *,
    x_range: Tuple[float, float],
    y_range: Tuple[float, float],
    z_range: Tuple[float, float],
    voxel_size: float,
    pad_to: int = 0,
):
    """(B, N, D) + mask -> pid-sorted column streams, 5 x (B, N) f32.

    The minimal eval-path pillarization for the slot-form PFN kernel
    (``ops/pallas_pfn.fused_stream_pfn_slots``): pid fusion + ONE stable
    multi-operand sort. Returns ``(x, y, z, intensity, pid)`` as SEPARATE
    (B, N) arrays — the kernel loads each as its own lane-contiguous block
    stream, so no (B, 8, N) channel-major stack exists (its write is
    sublane-strided, measured ~1.5 ms/b8). Out-of-range/invalid points
    carry the ``grid_h*grid_w`` pid sentinel (they sort to the stream
    tail). The whole pillar directory (kept/is_first/starts/coords/valid)
    that :func:`pillarize_stream` builds in XLA lives in-kernel instead.

    ``pad_to > n`` appends sentinel tail lanes (zero features, sentinel pid)
    fused into the sort-output copies — the PFN/canvas kernels' tile
    alignment and sentinel tail come for free instead of costing a separate
    full-stream ``jnp.pad`` round trip (pass ``pre_padded=True`` downstream).
    """
    b, n, d = points.shape
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    grid_w = int(round((x_range[1] - x_range[0]) / voxel_size))
    grid_h = int(round((y_range[1] - y_range[0]) / voxel_size))
    sentinel = grid_h * grid_w

    in_range = (
        (x >= x_range[0]) & (x < x_range[1])
        & (y >= y_range[0]) & (y < y_range[1])
        & (z >= z_range[0]) & (z < z_range[1])
        & valid
    )
    ix = jnp.clip(jnp.floor((x - x_range[0]) / voxel_size).astype(jnp.int32),
                  0, grid_w - 1)
    iy = jnp.clip(jnp.floor((y - y_range[0]) / voxel_size).astype(jnp.int32),
                  0, grid_h - 1)
    pid = jnp.where(in_range, iy * grid_w + ix, sentinel)

    n_out = max(pad_to, n)
    tail = n_out - n

    def one(pid1, p1):
        cols = [p1[:, i].astype(jnp.float32) for i in range(min(d, 4))]
        ops = jax.lax.sort([pid1] + cols, dimension=0, is_stable=True,
                           num_keys=1)
        z1 = jnp.zeros((n_out,), jnp.float32)
        vals = [jnp.pad(c, (0, tail)) for c in ops[1:]]
        vals += [z1] * (4 - len(cols))
        pidf = jnp.pad(ops[0].astype(jnp.float32), (0, tail),
                       constant_values=float(sentinel))
        return tuple(vals) + (pidf,)

    return jax.vmap(one)(pid, points)  # 5 x (B, n_out)


def gather_at_starts(stream_vals: jax.Array, starts: jax.Array, valid: jax.Array):
    """(B, N, C) stream + (B, P) starts -> (B, P, C) pillar table (zeros if invalid)."""
    table = jnp.take_along_axis(stream_vals, starts[..., None], axis=-2)
    return jnp.where(valid[..., None], table, 0)
