"""Bilinear point sampling + PointRend uncertainty sampling.

TPU equivalents of ``mmcv.ops.point_sample`` and mmdet's
``get_uncertain_point_coords_with_randomness`` used by the reference loss
(reference ``mask2former_head.py:8,11,191-200,402``): bilinear sampling of
mask logits at normalized [0,1]² coordinates (align_corners=False,
zero padding — torch ``grid_sample`` defaults), and the importance-sampling
scheme (oversample uniform, keep the most uncertain fraction, refill the
rest uniformly).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def point_sample(img: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample (..., H, W) images at normalized points.

    Args:
      img: (..., H, W) — any leading batch dims.
      coords: (P, 2) in [0, 1], (x, y) order (mmcv convention).
    Returns:
      (..., P) bilinear samples, zero padding outside.
    """
    h, w = img.shape[-2], img.shape[-1]
    x = coords[:, 0] * w - 0.5
    y = coords[:, 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0

    def gather(ix, iy):
        inb = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        vals = img[..., iyc, ixc]  # (..., P)
        return jnp.where(inb, vals, 0.0)

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    top = v00 * (1 - wx1) + v01 * wx1
    bot = v10 * (1 - wx1) + v11 * wx1
    return top * (1 - wy1) + bot * wy1


def _hat_weights(t: jax.Array, n: int, dtype) -> jax.Array:
    """(P,) continuous grid coords -> (P, n) bilinear hat weights.

    ``w[p, i] = max(0, 1 - |t_p - i|)``: the dense-matrix form of bilinear
    interpolation with zero padding (out-of-range mass simply has no row to
    land on, matching torch ``grid_sample`` zero-padding semantics).
    """
    idx = jnp.arange(n, dtype=jnp.float32)
    w = 1.0 - jnp.abs(t[:, None] - idx[None, :])
    return jnp.maximum(w, 0.0).astype(dtype)


def _dense_one(img: jax.Array, coords: jax.Array, mm_dtype) -> jax.Array:
    """Matmul-form bilinear sample of one (H, W) image at (P, 2) coords."""
    h, w = img.shape
    ry = _hat_weights(coords[:, 1] * h - 0.5, h, mm_dtype)  # (P, H)
    cx = _hat_weights(coords[:, 0] * w - 0.5, w, mm_dtype)  # (P, W)
    t = jnp.einsum("ph,hw->pw", ry, img.astype(mm_dtype),
                   preferred_element_type=jnp.float32)  # (P, W)
    return jnp.einsum("pw,pw->p", t, cx.astype(jnp.float32))


def _chunked_map(fn, xs_tree, p: int, chunk: Optional[int]):
    """lax.map ``fn`` over length-``p`` leading-axis chunks of ``xs_tree``.

    The body is rematerialized (``jax.checkpoint``): without it, lax.map's
    backward STACKS each chunk's residuals — the (chunk, P, H) hat matrices
    would come back as a full (N, P, H) tensor (GBs at flagship shapes),
    defeating the chunking. Recomputing the hats is elementwise-cheap.
    """
    if not chunk or chunk >= p or p % chunk != 0:
        return jax.checkpoint(fn)(xs_tree)
    k = p // chunk
    xs = jax.tree.map(
        lambda a: a.reshape((k, chunk) + a.shape[1:]), xs_tree)
    out = jax.lax.map(jax.checkpoint(fn), xs)
    return jax.tree.map(
        lambda a: a.reshape((p,) + a.shape[2:]), out)


def point_sample_dense(imgs: jax.Array, coords: jax.Array,
                       mm_dtype=jnp.float32,
                       chunk: Optional[int] = None) -> jax.Array:
    """Sample N images at SHARED coords via hat-weight matmuls: (N, P).

    Same values as :func:`point_sample` (the hat construction
    ``max(0, 1-|t-i|)`` reproduces bilinear weights exactly, including
    zero padding — out-of-range mass has no row to land on), but both the
    forward and its autodiff backward are MXU matmuls instead of XLA's
    element gather/scatter, which run at ~62 M elem/s on TPU and made the
    f32 train step 9.05 s (measurements/r3/train_time.log + trace).

    Args:
      imgs: (N, H, W); coords: (P, 2) normalized, shared across images.
      mm_dtype: matmul operand dtype. ``bfloat16`` quadruples MXU rate at
        ~0.4% relative noise on sampled values (accumulation stays f32).
      chunk: evaluate P in sequential chunks of this size (bounds the
        (N, chunk, H)-shaped intermediates; chunk must divide P).
    """
    n_img = imgs.shape[0]
    p = coords.shape[0]
    h, w = imgs.shape[-2:]

    def on_chunk(pts):
        ry = _hat_weights(pts[:, 1] * h - 0.5, h, mm_dtype)  # (p, H)
        cx = _hat_weights(pts[:, 0] * w - 0.5, w, mm_dtype)  # (p, W)
        t = jnp.einsum("ph,nhw->npw", ry, imgs.astype(mm_dtype),
                       preferred_element_type=jnp.float32)
        return jnp.einsum("npw,pw->np", t, cx.astype(jnp.float32))

    if not chunk or chunk >= p or p % chunk != 0:
        return jax.checkpoint(on_chunk)(coords)
    out = jax.lax.map(jax.checkpoint(on_chunk),
                      coords.reshape(p // chunk, chunk, 2))
    return out.transpose(1, 0, 2).reshape(n_img, p)  # (K, N, c) -> (N, P)


def point_sample_dense_per(imgs: jax.Array, coords: jax.Array,
                           mm_dtype=jnp.float32,
                           chunk: Optional[int] = None) -> jax.Array:
    """Per-image-coords variant: (N, H, W) x (N, P, 2) -> (N, P).

    ``chunk`` bounds memory by mapping sequential chunks of the N axis
    (each chunk materializes (chunk, P, H) hat matrices).
    """
    def on_chunk(args):
        im, pts = args
        return jax.vmap(lambda i, p: _dense_one(i, p, mm_dtype))(im, pts)

    return _chunked_map(on_chunk, (imgs, coords), imgs.shape[0], chunk)


def uncertain_point_coords(
    rng: jax.Array,
    mask_logits: jax.Array,
    num_points: int,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
    dense: bool = False,
    mm_dtype=jnp.float32,
    chunk: Optional[int] = None,
) -> jax.Array:
    """Per-mask point coords biased toward uncertain (near-boundary) logits.

    Args:
      rng: PRNG key.
      mask_logits: (M, H, W) per-mask logits.
      num_points: points to return per mask.
      dense: sample via matmul-form bilinear (the TPU path; values only
        RANK points here, so ``mm_dtype=bfloat16`` is safe).
    Returns:
      (M, num_points, 2) coords in [0,1]² (x, y).
    """
    m = mask_logits.shape[0]
    n_sampled = int(num_points * oversample_ratio)
    n_uncertain = int(importance_sample_ratio * num_points)
    n_random = num_points - n_uncertain
    k1, k2 = jax.random.split(rng)

    coords = jax.random.uniform(k1, (m, n_sampled, 2))
    if dense:
        logits = point_sample_dense_per(
            mask_logits, coords, mm_dtype=mm_dtype, chunk=chunk)
    else:
        logits = jax.vmap(point_sample)(mask_logits, coords)  # (M, n_sampled)
    # top-k by |logit| closeness to 0, carrying the coords THROUGH the sort:
    # top_k + take_along_axis costs a (M*n_uncertain, 2) row gather (~10
    # ns/row on TPU — it was the single largest op of the train step, 127
    # ms/step at flagship scale); a multi-operand sort permutes the coord
    # columns in the same pass, so the selection becomes a free slice. The
    # selected SET equals top_k's (ties broken by index either way), and the
    # point losses reduce over the point axis, so order is immaterial.
    _, cx, cy = jax.lax.sort(
        [jnp.abs(logits), coords[..., 0], coords[..., 1]],
        dimension=-1, num_keys=1, is_stable=True)
    picked = jnp.stack([cx[:, :n_uncertain], cy[:, :n_uncertain]], axis=-1)
    if n_random > 0:
        rand = jax.random.uniform(k2, (m, n_random, 2))
        picked = jnp.concatenate([picked, rand], axis=1)
    return picked
