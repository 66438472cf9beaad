"""Pairwise box IoU — native C++ kernel + numpy fallback + on-device jnp.

Three tiers (SURVEY.md §7 'native component'):
  1. `bbox_overlaps`           — C++ via ctypes (mmnas_tpu/native/bbox.cpp),
                                 the rebuild of the Cython bbox.pyx kernel;
                                 falls back to numpy if the toolchain is
                                 unavailable.
  2. `bbox_overlaps_np`        — vectorized numpy twin (the reference also
                                 keeps one, mmnas/utils/overlaps.py).
  3. `bbox_overlaps_jnp`       — jnp version for use INSIDE jitted programs
                                 (device-side VGD eval, engine/vgd.py).

All use the Fast R-CNN +1 pixel-area convention (bbox.pyx:33-55).
"""

from __future__ import annotations

import ctypes
import warnings

import numpy as np

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    try:
        from mmnas_tpu.native.build import build
        path = build()
        lib = ctypes.CDLL(path)
        lib.bbox_overlaps.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double)]
        lib.bbox_overlaps_batch_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain missing
        warnings.warn(f"native bbox kernel unavailable ({e}); using numpy")
        _lib = False
    return _lib


def bbox_overlaps_np(boxes: np.ndarray, query_boxes: np.ndarray) -> np.ndarray:
    """Vectorized numpy IoU, [N,4] x [K,4] -> [N,K]."""
    boxes = np.asarray(boxes, np.float64)
    query = np.asarray(query_boxes, np.float64)
    iw = (np.minimum(boxes[:, None, 2], query[None, :, 2])
          - np.maximum(boxes[:, None, 0], query[None, :, 0]) + 1.0)
    ih = (np.minimum(boxes[:, None, 3], query[None, :, 3])
          - np.maximum(boxes[:, None, 1], query[None, :, 1]) + 1.0)
    inter = np.maximum(iw, 0.0) * np.maximum(ih, 0.0)
    b_area = (boxes[:, 2] - boxes[:, 0] + 1.0) * (boxes[:, 3] - boxes[:, 1] + 1.0)
    q_area = (query[:, 2] - query[:, 0] + 1.0) * (query[:, 3] - query[:, 1] + 1.0)
    union = b_area[:, None] + q_area[None, :] - inter
    out = np.where(inter > 0, inter / union, 0.0)
    return out


def bbox_overlaps(boxes: np.ndarray, query_boxes: np.ndarray) -> np.ndarray:
    """[N,4] x [K,4] -> [N,K] IoU via the C++ kernel (numpy fallback)."""
    lib = _load_lib()
    if not lib:
        return bbox_overlaps_np(boxes, query_boxes)
    boxes = np.ascontiguousarray(boxes, np.float64)
    query = np.ascontiguousarray(query_boxes, np.float64)
    n, k = boxes.shape[0], query.shape[0]
    out = np.zeros((n, k), np.float64)
    lib.bbox_overlaps(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        query.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), k,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def bbox_overlaps_batch(boxes: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Batched [B,N,4] x [B,1,4] -> [B,N] float32 IoU (loader hot path)."""
    lib = _load_lib()
    boxes = np.ascontiguousarray(boxes, np.float32)
    query = np.ascontiguousarray(query, np.float32).reshape(boxes.shape[0], 4)
    if not lib:
        return np.stack([
            bbox_overlaps_np(boxes[i], query[i:i + 1])[:, 0]
            for i in range(boxes.shape[0])]).astype(np.float32)
    b, n = boxes.shape[0], boxes.shape[1]
    out = np.zeros((b, n), np.float32)
    lib.bbox_overlaps_batch_f32(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), b, n,
        query.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def bbox_overlaps_jnp(boxes, query_boxes):
    """jnp IoU for inside-jit use; same math, [..,N,4] x [..,K,4] -> [..,N,K]."""
    import jax.numpy as jnp
    iw = (jnp.minimum(boxes[..., :, None, 2], query_boxes[..., None, :, 2])
          - jnp.maximum(boxes[..., :, None, 0], query_boxes[..., None, :, 0]) + 1.0)
    ih = (jnp.minimum(boxes[..., :, None, 3], query_boxes[..., None, :, 3])
          - jnp.maximum(boxes[..., :, None, 1], query_boxes[..., None, :, 1]) + 1.0)
    inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
    b_area = ((boxes[..., 2] - boxes[..., 0] + 1.0)
              * (boxes[..., 3] - boxes[..., 1] + 1.0))
    q_area = ((query_boxes[..., 2] - query_boxes[..., 0] + 1.0)
              * (query_boxes[..., 3] - query_boxes[..., 1] + 1.0))
    union = b_area[..., :, None] + q_area[..., None, :] - inter
    return jnp.where(inter > 0, inter / union, 0.0)
