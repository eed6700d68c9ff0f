"""
Native host-side kernels (C++/OpenMP) with build-on-demand ctypes
bindings. Falls back gracefully (is_available() == False) when no
compiler is present; all callers have pure-Python/numpy paths.
"""

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_BUILD_FAILED = False

_SRC = os.path.join(os.path.dirname(__file__), 'letterbox_nms.cpp')
_LIB_PATH = os.path.join(os.path.dirname(__file__), 'libmdnative.so')


def _build():
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-fopenmp', _SRC,
           '-o', _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    try:
        if not os.path.isfile(_LIB_PATH) or \
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)

        lib.letterbox_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_uint8]
        lib.letterbox_u8.restype = None

        lib.nms_xyxy.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_int32)]
        lib.nms_xyxy.restype = ctypes.c_int

        lib.cluster_boxes.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32)]
        lib.cluster_boxes.restype = ctypes.c_int

        _LIB = lib
    except Exception:
        _BUILD_FAILED = True
    return _LIB


def is_available():
    """True when the native library built (or loaded) successfully."""

    return _load() is not None


def letterbox_u8(image, out_size, pad_value=114):
    """
    Fused native letterbox: HWC uint8 -> [out_size, out_size, 3] uint8
    (geometry identical to ops/boxes.letterbox(auto=False, scaleup=True)).
    """

    lib = _load()
    assert lib is not None, 'Native library unavailable'
    image = np.ascontiguousarray(image, dtype=np.uint8)
    assert image.ndim == 3 and image.shape[2] == 3
    h, w = image.shape[:2]
    out = np.empty((out_size, out_size, 3), dtype=np.uint8)
    lib.letterbox_u8(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_size, pad_value)
    return out


def nms_xyxy(boxes, scores, iou_thres):
    """
    Native greedy NMS. boxes [N,4] xyxy, scores [N]; returns kept indices
    (score-descending numpy int32 array).
    """

    lib = _load()
    assert lib is not None, 'Native library unavailable'
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    scores = np.ascontiguousarray(scores, dtype=np.float32)
    n = boxes.shape[0]
    keep = np.empty(n, dtype=np.int32)
    n_keep = lib.nms_xyxy(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, float(iou_thres),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return keep[:n_keep].copy()


def cluster_boxes(boxes_xywh, categories, iou_thres,
                  category_agnostic=False):
    """
    Native greedy IoU clustering (RDE hot loop). boxes [N,4] normalized
    xywh, categories [N] ints; returns (cluster_ids [N], n_clusters).
    """

    lib = _load()
    assert lib is not None, 'Native library unavailable'
    boxes = np.ascontiguousarray(boxes_xywh, dtype=np.float32)
    categories = np.ascontiguousarray(categories, dtype=np.int32)
    n = boxes.shape[0]
    out = np.empty(n, dtype=np.int32)
    n_clusters = lib.cluster_boxes(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        categories.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n, float(iou_thres), int(category_agnostic),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out, n_clusters
