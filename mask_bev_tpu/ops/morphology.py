"""Binary morphology (close/open) matching cv2 semantics, numpy + jnp.

Replaces the reference's cv2 ``morphologyEx`` MORPH_CLOSE/MORPH_OPEN with a
9x9 rect kernel (reference ``semantic_kitti_rasterizer.py:71-88``; SURVEY.md
§2.2 N9). Border semantics follow cv2 defaults: dilation treats outside as 0,
erosion treats outside as 1 (so edge pixels are not eroded by the border).

The jnp versions are max-/min-pool formulations that fuse into on-device
pipelines (used by the TPU mask-cache generator).
"""
from __future__ import annotations

import numpy as np
from scipy import ndimage


def _structure(k: int) -> np.ndarray:
    return np.ones((k, k), bool)


def binary_dilate(mask: np.ndarray, k: int = 9) -> np.ndarray:
    return ndimage.binary_dilation(mask, _structure(k), border_value=0)


def binary_erode(mask: np.ndarray, k: int = 9) -> np.ndarray:
    return ndimage.binary_erosion(mask, _structure(k), border_value=1)


def binary_close(mask: np.ndarray, k: int = 9) -> np.ndarray:
    return binary_erode(binary_dilate(mask, k), k)


def binary_open(mask: np.ndarray, k: int = 9) -> np.ndarray:
    return binary_dilate(binary_erode(mask, k), k)


def close_then_open(mask: np.ndarray, k: int = 9) -> np.ndarray:
    """The reference's GT-mask cleanup: MORPH_CLOSE then MORPH_OPEN."""
    return binary_open(binary_close(mask, k), k)


# ---- jnp variants (same semantics, on-device) ----

def _pool(x, k, init, op):
    import jax.lax as lax

    pad = k // 2
    return lax.reduce_window(
        x, init, op, window_dimensions=(k, k), window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)))


def jnp_dilate(mask, k: int = 9):
    """(H, W) bool/float -> max-pool dilation (outside = 0)."""
    import jax.lax as lax
    import jax.numpy as jnp

    return _pool(mask.astype(jnp.float32), k, -jnp.inf, lax.max) > 0.5


def jnp_erode(mask, k: int = 9):
    """(H, W) -> min-pool erosion with outside = 1 (cv2 border semantics)."""
    import jax.lax as lax
    import jax.numpy as jnp

    x = mask.astype(jnp.float32)
    pad = k // 2
    x = jnp.pad(x, pad, constant_values=1.0)
    out = lax.reduce_window(
        x, jnp.inf, lax.min, window_dimensions=(k, k), window_strides=(1, 1),
        padding="VALID")
    return out > 0.5


def jnp_close_then_open(mask, k: int = 9):
    x = jnp_erode(jnp_dilate(mask, k), k)  # close
    return jnp_dilate(jnp_erode(x, k), k)  # open
