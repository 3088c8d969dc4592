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


def uncertain_point_coords(
    rng: jax.Array,
    mask_logits: jax.Array,
    num_points: int,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
) -> jax.Array:
    """Per-mask point coords biased toward uncertain (near-boundary) logits.

    Args:
      rng: PRNG key.
      mask_logits: (M, H, W) per-mask logits.
      num_points: points to return per mask.
    Returns:
      (M, num_points, 2) coords in [0,1]² (x, y).
    """
    m = mask_logits.shape[0]
    n_sampled = int(num_points * oversample_ratio)
    n_uncertain = int(importance_sample_ratio * num_points)
    n_random = num_points - n_uncertain
    k1, k2 = jax.random.split(rng)

    coords = jax.random.uniform(k1, (m, n_sampled, 2))
    logits = jax.vmap(point_sample)(mask_logits, coords)  # (M, n_sampled)
    uncertainty = -jnp.abs(logits)
    _, idx = jax.lax.top_k(uncertainty, n_uncertain)
    picked = jnp.take_along_axis(coords, idx[..., None], axis=1)
    if n_random > 0:
        rand = jax.random.uniform(k2, (m, n_random, 2))
        picked = jnp.concatenate([picked, rand], axis=1)
    return picked
