"""ctypes bindings for the native host core (graceful numpy fallback).

Build with ``make -C native`` (produces ``libmaskbev_host.so`` here). Every
entry point has identical semantics to its numpy twin; the data layer calls
through :func:`available` and falls back transparently.
"""
from __future__ import annotations

import ctypes
import pathlib
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = pathlib.Path(__file__).parent / "libmaskbev_host.so"
    if not so.exists():
        return None
    lib = ctypes.CDLL(str(so))
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.close_then_open.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int]
    lib.fill_rotated_boxes_img.argtypes = [
        i32p, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p, u8p,
        ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float]
    lib.points_in_boxes_count.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p, ctypes.c_int,
        i32p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def close_then_open(mask: np.ndarray, k: int = 9) -> np.ndarray:
    """Binary close-then-open, cv2 border semantics. mask: (H, W) bool."""
    lib = _load()
    if lib is None:
        from mask_bev_tpu.ops.morphology import close_then_open as np_cto

        return np_cto(mask, k)
    buf = np.ascontiguousarray(mask, np.uint8)
    lib.close_then_open(buf, mask.shape[0], mask.shape[1], k)
    return buf.astype(bool)


def fill_rotated_boxes_img(h: int, w: int, centers: np.ndarray,
                           dims: np.ndarray, yaws: np.ndarray,
                           keep: np.ndarray, x0: float, y0: float,
                           voxel: float) -> Optional[np.ndarray]:
    """(N,2) centers/(N,2) dims/(N,) yaws -> (H, W) int32 instance-id image
    (sequential overwrite, id = index + 1). None if the lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    img = np.zeros((h, w), np.int32)
    lib.fill_rotated_boxes_img(
        img, h, w,
        np.ascontiguousarray(centers, np.float32),
        np.ascontiguousarray(dims, np.float32),
        np.ascontiguousarray(yaws, np.float32),
        np.ascontiguousarray(keep, np.uint8),
        len(yaws), np.float32(x0), np.float32(y0), np.float32(voxel))
    return img


def points_in_boxes_count(points: np.ndarray, centers3: np.ndarray,
                          dims3: np.ndarray, yaws: np.ndarray
                          ) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.zeros((len(yaws),), np.int32)
    lib.points_in_boxes_count(
        pts, pts.shape[0], pts.shape[1],
        np.ascontiguousarray(centers3, np.float32),
        np.ascontiguousarray(dims3, np.float32),
        np.ascontiguousarray(yaws, np.float32), len(yaws), out)
    return out
