"""Rotated-box IoU via polygon clipping — fixed-shape jnp, TPU-friendly.

Replaces the reference's numba.cuda shared-memory kernel
(``evaluation/rotate_iou.py:264-332``; SURVEY.md §2.2 N1) with a vectorized
Sutherland-Hodgman clip over fixed 8-vertex buffers: clip quad A by each of
quad B's 4 half-planes, track vertex validity masks, shoelace area at the
end. Pure jnp -> jit/vmap to arbitrary (N, M) pair grids on TPU, and runs
fine on CPU for offline eval.

Box format: (cx, cy, w, l, angle) — the KITTI-eval convention the reference
kernel consumes (its ``rotate_iou_gpu_eval`` takes [x, y, w, l, ry]).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_MAX_V = 8  # intersection of two convex quads has <= 8 vertices


def box_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) -> (..., 4, 2) corners CCW."""
    cx, cy, w, l, a = (boxes[..., i] for i in range(5))
    c, s = jnp.cos(a), jnp.sin(a)
    # local corners (+-l/2 along heading, +-w/2 lateral), CCW
    lx = jnp.stack([l / 2, -l / 2, -l / 2, l / 2], -1)
    ly = jnp.stack([w / 2, w / 2, -w / 2, -w / 2], -1)
    x = cx[..., None] + lx * c[..., None] - ly * s[..., None]
    y = cy[..., None] + lx * s[..., None] + ly * c[..., None]
    return jnp.stack([x, y], -1)


def _polygon_area(pts: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Shoelace over the first k valid vertices of a fixed (V, 2) buffer."""
    v = _MAX_V
    idx = jnp.arange(v)
    count = valid.sum()
    nxt = jnp.where(idx + 1 < count, idx + 1, 0)
    x, y = pts[:, 0], pts[:, 1]
    terms = x * y[nxt] - x[nxt] * y
    terms = jnp.where(idx < count, terms, 0.0)
    return jnp.abs(terms.sum()) / 2.0


def _clip_by_halfplane(pts, valid, a, b, c):
    """Clip polygon (fixed buffer + validity) by half-plane ax+by+c >= 0.

    Classic Sutherland-Hodgman emit rule, done with static shapes: each input
    edge (p -> q) emits up to 2 vertices; we materialize the 2V candidate
    slots and compact them with a cumsum scatter.
    """
    v = _MAX_V
    idx = jnp.arange(v)
    count = valid.sum()
    nxt = jnp.where(idx + 1 < count, idx + 1, 0)
    p = pts
    q = pts[nxt]
    fp = a * p[:, 0] + b * p[:, 1] + c
    fq = a * q[:, 0] + b * q[:, 1] + c
    p_in = fp >= 0
    q_in = fq >= 0
    edge_active = idx < count

    denom = fp - fq
    t = jnp.where(jnp.abs(denom) > 1e-12, fp / jnp.where(denom == 0, 1.0, denom), 0.0)
    inter = p + t[:, None] * (q - p)

    # per edge: emit p if p_in; emit intersection if p_in != q_in
    emit1 = edge_active & p_in
    emit2 = edge_active & (p_in ^ q_in)
    cand = jnp.stack([p, inter], 1).reshape(2 * v, 2)
    emit = jnp.stack([emit1, emit2], 1).reshape(2 * v)

    pos = jnp.cumsum(emit) - 1
    dest = jnp.where(emit, pos, 2 * v)
    out = jnp.zeros((2 * v, 2)).at[dest].set(cand, mode="drop")[:v]
    new_count = jnp.minimum(emit.sum(), v)
    return out, jnp.arange(v) < new_count


def rotated_iou_pair(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """IoU of two (5,) rotated boxes."""
    ca = box_corners(box_a)
    cb = box_corners(box_b)
    pts = jnp.zeros((_MAX_V, 2)).at[:4].set(ca)
    valid = jnp.arange(_MAX_V) < 4

    # clip by each edge of B (CCW -> interior is left of each edge)
    def body(i, state):
        pts, valid = state
        p0 = cb[i]
        p1 = cb[(i + 1) % 4]
        # half-plane: cross(p1-p0, x-p0) >= 0
        a = -(p1[1] - p0[1])
        b = p1[0] - p0[0]
        c = -(a * p0[0] + b * p0[1])
        return _clip_by_halfplane(pts, valid, a, b, c)

    pts, valid = jax.lax.fori_loop(0, 4, body, (pts, valid))
    inter = _polygon_area(pts, valid)
    area_a = box_a[2] * box_a[3]
    area_b = box_b[2] * box_b[3]
    union = area_a + area_b - inter
    return jnp.where(union > 1e-12, inter / union, 0.0)


@jax.jit
def rotated_iou_matrix(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N, 5) x (M, 5) -> (N, M) IoU matrix (jitted, vmapped)."""
    return jax.vmap(lambda a: jax.vmap(lambda b: rotated_iou_pair(a, b))(boxes_b))(
        boxes_a)


def _np_box_corners(boxes: np.ndarray) -> np.ndarray:
    cx, cy, w, l, a = (boxes[:, i] for i in range(5))
    c, s = np.cos(a), np.sin(a)
    lx = np.stack([l / 2, -l / 2, -l / 2, l / 2], -1)
    ly = np.stack([w / 2, w / 2, -w / 2, -w / 2], -1)
    x = cx[:, None] + lx * c[:, None] - ly * s[:, None]
    y = cy[:, None] + lx * s[:, None] + ly * c[:, None]
    return np.stack([x, y], -1)


def _np_clip_area(poly_a: np.ndarray, poly_b: np.ndarray) -> float:
    """Sutherland-Hodgman clip of quad A by quad B, shoelace area (numpy)."""
    out = list(poly_a)
    for i in range(4):
        p0, p1 = poly_b[i], poly_b[(i + 1) % 4]
        a = -(p1[1] - p0[1])
        b = p1[0] - p0[0]
        c = -(a * p0[0] + b * p0[1])
        inp, out = out, []
        if not inp:
            return 0.0
        prev = inp[-1]
        fprev = a * prev[0] + b * prev[1] + c
        for cur in inp:
            fcur = a * cur[0] + b * cur[1] + c
            if fcur >= 0:
                if fprev < 0:
                    t = fprev / (fprev - fcur)
                    out.append(prev + t * (cur - prev))
                out.append(cur)
            elif fprev >= 0:
                t = fprev / (fprev - fcur)
                out.append(prev + t * (cur - prev))
            prev, fprev = cur, fcur
    if len(out) < 3:
        return 0.0
    pts = np.asarray(out)
    x, y = pts[:, 0], pts[:, 1]
    return abs(float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))) / 2


def rotate_iou_eval(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Host-facing drop-in for the reference's ``rotate_iou_gpu_eval``.

    Pure numpy (this host path runs in the offline eval where the jit compile
    cost on a small-core host dwarfs the compute); use
    :func:`rotated_iou_matrix` for the on-device version.
    """
    na, nb = len(boxes_a), len(boxes_b)
    if na == 0 or nb == 0:
        return np.zeros((na, nb), np.float32)
    boxes_a = np.asarray(boxes_a, np.float64)
    boxes_b = np.asarray(boxes_b, np.float64)
    ca = _np_box_corners(boxes_a)
    cb = _np_box_corners(boxes_b)
    area_a = boxes_a[:, 2] * boxes_a[:, 3]
    area_b = boxes_b[:, 2] * boxes_b[:, 3]
    out = np.zeros((na, nb), np.float64)
    for i in range(na):
        # cheap AABB prefilter
        lo_a, hi_a = ca[i].min(0), ca[i].max(0)
        for j in range(nb):
            if (cb[j][:, 0].max() < lo_a[0] or cb[j][:, 0].min() > hi_a[0]
                    or cb[j][:, 1].max() < lo_a[1] or cb[j][:, 1].min() > hi_a[1]):
                continue
            inter = _np_clip_area(ca[i], cb[j])
            union = area_a[i] + area_b[j] - inter
            out[i, j] = inter / union if union > 1e-12 else 0.0
    return out.astype(np.float32)
