"""Native (C++) evaluator kernels, loaded via ctypes with a build-on-demand
fallback (the reference ships CUDA/numba equivalents; see src/rotate_iou.cpp).

Usage: ``lib = load_native()`` returns None when no compiler is available, in
which case callers fall back to the numpy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "rotate_iou.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "librotate_iou.so")
_lib = None
_tried = False


def build_native(force: bool = False) -> Optional[str]:
    fresh = (os.path.exists(_LIB)
             and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC))
    if fresh and not force:
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True)
        return _LIB
    except (OSError, subprocess.CalledProcessError):
        return None


def load_native() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = build_native()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    dptr = ctypes.POINTER(ctypes.c_double)
    for name, nargs in [("rotate_iou_eval", 5), ("d3_box_overlap", 7),
                        ("image_box_overlap", 4)]:
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [dptr, ctypes.c_long, dptr, ctypes.c_long,
                       ctypes.c_int, dptr]
    _lib = lib
    return _lib


def _call(fn_name: str, boxes: np.ndarray, qboxes: np.ndarray,
          criterion: int) -> np.ndarray:
    lib = load_native()
    assert lib is not None
    boxes = np.ascontiguousarray(boxes, dtype=np.float64)
    qboxes = np.ascontiguousarray(qboxes, dtype=np.float64)
    n, k = boxes.shape[0], qboxes.shape[0]
    out = np.zeros((n, k), dtype=np.float64)
    dptr = ctypes.POINTER(ctypes.c_double)
    getattr(lib, fn_name)(
        boxes.ctypes.data_as(dptr), n, qboxes.ctypes.data_as(dptr), k,
        criterion, out.ctypes.data_as(dptr))
    return out


def rotate_iou_eval_native(boxes, qboxes, criterion=-1):
    return _call("rotate_iou_eval", boxes, qboxes, criterion)


def d3_box_overlap_native(boxes, qboxes, criterion=-1):
    return _call("d3_box_overlap", boxes, qboxes, criterion)


def image_box_overlap_native(boxes, qboxes, criterion=-1):
    return _call("image_box_overlap", boxes, qboxes, criterion)


def compute_statistics_thresholds_native(overlaps, dt_scores, dt_alphas,
                                         gt_alphas, dt_bboxes, ignored_gt,
                                         ignored_det, dc_bboxes, metric,
                                         min_overlap, thresholds,
                                         compute_aos) -> np.ndarray:
    """Accumulate (T, 4) tp/fp/fn/similarity for one image over all
    thresholds (C++ fast path; falls back handled by caller)."""
    lib = load_native()
    assert lib is not None
    n_dt, n_gt = overlaps.shape if overlaps.size else (len(dt_scores), len(gt_alphas))
    assert n_dt <= 4096, "per-image detection count exceeds native buffer"
    fn = lib.compute_statistics_thresholds
    if not getattr(fn, "_configured", False):
        dptr = ctypes.POINTER(ctypes.c_double)
        lptr = ctypes.POINTER(ctypes.c_long)
        fn.restype = None
        fn.argtypes = [dptr, dptr, dptr, dptr, dptr, lptr, lptr, dptr,
                       ctypes.c_long, ctypes.c_long, ctypes.c_long,
                       ctypes.c_int, ctypes.c_double, dptr, ctypes.c_long,
                       ctypes.c_int, dptr]
        fn._configured = True

    def d(x):
        return np.ascontiguousarray(x, dtype=np.float64)

    def l(x):
        return np.ascontiguousarray(x, dtype=np.int64)

    dptr = ctypes.POINTER(ctypes.c_double)
    lptr = ctypes.POINTER(ctypes.c_long)
    ov = d(overlaps).reshape(n_dt, n_gt) if overlaps.size else np.zeros((max(n_dt,1), max(n_gt,1)))
    thresholds = d(thresholds)
    pr = np.zeros((len(thresholds), 4), dtype=np.float64)
    fn(d(ov).ctypes.data_as(dptr), d(dt_scores).ctypes.data_as(dptr),
       d(dt_alphas).ctypes.data_as(dptr), d(gt_alphas).ctypes.data_as(dptr),
       d(dt_bboxes).ctypes.data_as(dptr), l(ignored_gt).ctypes.data_as(lptr),
       l(ignored_det).ctypes.data_as(lptr),
       d(dc_bboxes).ctypes.data_as(dptr),
       n_dt, n_gt, len(dc_bboxes), metric, float(min_overlap),
       thresholds.ctypes.data_as(dptr), len(thresholds), int(compute_aos),
       pr.ctypes.data_as(dptr))
    return pr
