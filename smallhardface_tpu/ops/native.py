"""ctypes loader for the native host kernels (csrc/shf_host.cpp).

The library is built on demand with g++ (cached in csrc/build/) — the
role of the reference's `make` step for lib/nms + cython_bbox
(/root/reference/lib/setup.py:112-150, lib/Makefile:1-3). Every entry
point falls back to the numpy implementation when the toolchain or the
.so is unavailable, and the numpy versions remain the test oracles.
"""

from __future__ import annotations

import ctypes
import logging
import os
import os.path as osp
import subprocess
import threading

import numpy as np

from smallhardface_tpu.ops import nms_np, bbox_np

logger = logging.getLogger(__name__)

_CSRC = osp.abspath(osp.join(osp.dirname(__file__), "..", "..", "csrc"))
_SO = osp.join(_CSRC, "build", "libshf_host.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    src = osp.join(_CSRC, "shf_host.cpp")
    if not osp.exists(src):
        return False
    try:
        subprocess.run(["make", "-C", _CSRC], check=True,
                       capture_output=True, timeout=120)
        return osp.exists(_SO)
    except Exception as e:
        logger.warning("native build failed (%s); using numpy fallbacks", e)
        return False


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not osp.exists(_SO) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.shf_nms.restype = ctypes.c_int
            lib.shf_bbox_vote.restype = ctypes.c_int
            lib.shf_bbox_overlaps.restype = None
            _lib = lib
        except OSError as e:
            logger.warning("failed to load %s: %s", _SO, e)
        return _lib


def _c_arr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def nms(dets, thresh):
    """Greedy NMS; returns kept row indices (descending score)."""
    dets = np.ascontiguousarray(dets, dtype=np.float64)
    lib = get_lib()
    if lib is None or dets.shape[0] == 0:
        return nms_np.nms(dets, thresh)
    keep = np.empty(dets.shape[0], dtype=np.int32)
    n = lib.shf_nms(_c_arr(dets), dets.shape[0], ctypes.c_double(thresh),
                    keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return keep[:n].tolist()


def bbox_vote(dets, thresh):
    """Score-weighted box voting; (N, 5) in → (M, 5) out."""
    dets = np.ascontiguousarray(dets, dtype=np.float64)
    lib = get_lib()
    if lib is None:
        return nms_np.bbox_vote(dets, thresh)
    cap = max(dets.shape[0], 1)
    out = np.empty((cap, 5), dtype=np.float64)
    n = lib.shf_bbox_vote(_c_arr(dets), dets.shape[0],
                          ctypes.c_double(thresh), _c_arr(out))
    return out[:n].copy()


def bbox_overlaps(boxes, query):
    boxes = np.ascontiguousarray(boxes, dtype=np.float64)
    query = np.ascontiguousarray(query, dtype=np.float64)
    lib = get_lib()
    if lib is None:
        return bbox_np.bbox_overlaps(boxes, query)
    out = np.empty((boxes.shape[0], query.shape[0]), dtype=np.float64)
    lib.shf_bbox_overlaps(_c_arr(boxes), boxes.shape[0], _c_arr(query),
                          query.shape[0], _c_arr(out))
    return out
