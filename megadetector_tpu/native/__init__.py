"""
Native host-side kernels (C++/OpenMP) with build-on-demand ctypes
bindings. Falls back gracefully (is_available() == False) when no
compiler is present; all callers have pure-Python/numpy paths.
"""

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_LIB = None
_BUILD_FAILED = False

_SRC = os.path.join(os.path.dirname(__file__), 'letterbox_nms.cpp')


def _hashed_lib_path(src_path, stem):
    """
    Library path keyed by a content hash of the source: any source edit
    changes the filename, so a stale binary can never shadow a rebuild
    (binaries are not committed; they always build from source).
    """

    with open(src_path, 'rb') as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(os.path.dirname(src_path),
                        '{}-{}.so'.format(stem, digest))


def _build(src, lib_path, extra_args=()):
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-fopenmp', src,
           '-o', lib_path] + list(extra_args)
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    try:
        lib_path = _hashed_lib_path(_SRC, 'libmdnative')
        if not os.path.isfile(lib_path):
            _build(_SRC, lib_path)
        lib = ctypes.CDLL(lib_path)

        lib.letterbox_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_uint8]
        lib.letterbox_u8.restype = None

        lib.letterbox_u8_rect.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_uint8]
        lib.letterbox_u8_rect.restype = None

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
    Fused native letterbox: HWC uint8 -> [out_h, out_w, 3] uint8
    (geometry identical to ops/boxes.letterbox(auto=False, scaleup=True)).
    out_size may be an int (square canvas) or an (out_h, out_w) tuple.
    """

    lib = _load()
    assert lib is not None, 'Native library unavailable'
    image = np.ascontiguousarray(image, dtype=np.uint8)
    assert image.ndim == 3 and image.shape[2] == 3
    h, w = image.shape[:2]
    if isinstance(out_size, (tuple, list)):
        out_h, out_w = int(out_size[0]), int(out_size[1])
    else:
        out_h = out_w = int(out_size)
    out = np.empty((out_h, out_w, 3), dtype=np.uint8)
    lib.letterbox_u8_rect(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h, out_w, pad_value)
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


#%% Native JPEG decode + letterbox (separate library: needs libjpeg)

_JPEG_LIB = None
_JPEG_BUILD_FAILED = False

_JPEG_SRC = os.path.join(os.path.dirname(__file__), 'jpeg_loader.cpp')

JL_OK = 0
JL_DECODE_ERROR = 1
JL_UNSUPPORTED_ORIENTATION = 2
JL_NOT_RGB = 3


def _load_jpeg():
    global _JPEG_LIB, _JPEG_BUILD_FAILED
    if _JPEG_LIB is not None or _JPEG_BUILD_FAILED:
        return _JPEG_LIB
    try:
        lib_path = _hashed_lib_path(_JPEG_SRC, 'libmdjpeg')
        if not os.path.isfile(lib_path):
            _build(_JPEG_SRC, lib_path, extra_args=['-ljpeg'])
        lib = ctypes.CDLL(lib_path)

        lib.decode_jpeg_letterbox_rect.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_uint8, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
        lib.decode_jpeg_letterbox_rect.restype = ctypes.c_int

        lib.decode_jpeg_letterbox_batch_rect.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_long), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_uint8, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        lib.decode_jpeg_letterbox_batch_rect.restype = None

        lib.decode_jpeg_scaled.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
        lib.decode_jpeg_scaled.restype = ctypes.c_int

        _JPEG_LIB = lib
    except Exception:
        _JPEG_BUILD_FAILED = True
    return _JPEG_LIB


def jpeg_loader_available():
    """True when the native JPEG loader built against libjpeg."""

    return _load_jpeg() is not None


def _canvas_hw(canvas):
    if isinstance(canvas, (tuple, list)):
        return int(canvas[0]), int(canvas[1])
    return int(canvas), int(canvas)


def decode_jpeg_letterbox(jpeg_bytes, canvas, pad_value=114,
                          dct_scale_target=0, scale_target=0):
    """
    Decode one JPEG (bytes), apply EXIF orientation (3/6/8), letterbox
    into a [canvas_h, canvas_w, 3] uint8 canvas (canvas: int for a
    square, or an (h, w) tuple for a rectangular aspect bucket).

    Returns (canvas_array, (src_h, src_w)) where src dims are
    post-rotation (the values scale_coords needs). Raises ValueError on
    decode failure, mirrored EXIF orientations (caller should fall back
    to the PIL path), or non-RGB JPEGs.

    dct_scale_target > 0 decodes large images at the smallest libjpeg
    scale_num/8 that still covers that long side — a large speedup on
    multi-megapixel camera-trap images, at a documented deviation from
    full-resolution-resize parity (performance mode only).

    scale_target > 0 derives the letterbox ratio from that square size
    instead of the rect canvas — pass the model's image_size with a
    minimal stride-rectangle canvas to reproduce letterbox(auto=True)
    geometry exactly.
    """

    lib = _load_jpeg()
    assert lib is not None, 'Native JPEG loader unavailable'
    canvas_h, canvas_w = _canvas_hw(canvas)
    buf = np.frombuffer(jpeg_bytes, dtype=np.uint8)
    out = np.empty((canvas_h, canvas_w, 3), dtype=np.uint8)
    dims = np.zeros(2, dtype=np.int32)
    rc = lib.decode_jpeg_letterbox_rect(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_long(buf.size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        canvas_h, canvas_w, int(pad_value), int(scale_target),
        int(dct_scale_target),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != JL_OK:
        raise ValueError('native JPEG decode failed (code {})'.format(rc))
    return out, (int(dims[0]), int(dims[1]))


def scaled_decode_dims(width, height, dct_scale_target):
    """
    The post-decode dims libjpeg produces for a JPEG of (width, height)
    at the smallest scale_num/8 whose long side covers
    [dct_scale_target] (0 = full resolution): ceil(dim * num / 8).
    """

    if dct_scale_target <= 0:
        return height, width
    long_side = max(width, height)
    num = 8
    for n in range(1, 9):
        if long_side * n // 8 >= dct_scale_target:
            num = n
            break
    return (height * num + 7) // 8, (width * num + 7) // 8


def decode_jpeg_scaled(jpeg_bytes, dct_scale_target=0):
    """
    Decode one JPEG (bytes) at a DCT scale covering
    [dct_scale_target] on the long side (0 = full resolution), with
    EXIF orientation (3/6/8) applied — no letterbox. Returns an HWC
    uint8 array of the post-rotation scaled image. Raises ValueError
    on failure (caller falls back to the Python path). Feeds the
    device-preprocess staging path, where the letterbox runs on the
    TPU.
    """

    import io
    from PIL import Image

    lib = _load_jpeg()
    assert lib is not None, 'Native JPEG loader unavailable'
    # Header-only dims (no decode) size the output buffer; C verifies
    with Image.open(io.BytesIO(jpeg_bytes)) as pim:
        w0, h0 = pim.size
    h, w = scaled_decode_dims(w0, h0, dct_scale_target)
    # Post-rotation worst case swaps dims
    side_h, side_w = max(h, w), max(h, w)
    buf = np.frombuffer(jpeg_bytes, dtype=np.uint8)
    out = np.zeros((side_h, side_w, 3), dtype=np.uint8)
    dims = np.zeros(2, dtype=np.int32)
    rc = lib.decode_jpeg_scaled(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_long(buf.size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        side_h, side_w, int(dct_scale_target),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != JL_OK:
        raise ValueError('native JPEG decode failed (code {})'.format(rc))
    fh, fw = int(dims[0]), int(dims[1])
    return np.ascontiguousarray(out[:fh, :fw])


def decode_jpeg_letterbox_batch(jpeg_buffers, canvas, pad_value=114,
                                dct_scale_target=0, scale_target=0,
                                out=None):
    """
    Decode a batch of JPEGs in parallel (OpenMP) straight into a staging
    array [n, canvas_h, canvas_w, 3] (pass [out] to reuse a pinned
    buffer; canvas: int or (h, w) tuple).

    Returns (staging, dims [n, 2], errs [n]) — errs[i] != 0 marks a
    per-image failure (slot content undefined); callers map those to the
    reference's 'image access failure' record.
    """

    lib = _load_jpeg()
    assert lib is not None, 'Native JPEG loader unavailable'
    canvas_h, canvas_w = _canvas_hw(canvas)
    n = len(jpeg_buffers)
    arrays = [np.frombuffer(b, dtype=np.uint8) for b in jpeg_buffers]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(*[
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for a in arrays])
    lens = (ctypes.c_long * n)(*[a.size for a in arrays])
    if out is None:
        out = np.empty((n, canvas_h, canvas_w, 3), dtype=np.uint8)
    else:
        assert out.shape == (n, canvas_h, canvas_w, 3) and \
            out.dtype == np.uint8
    dims = np.zeros((n, 2), dtype=np.int32)
    errs = np.zeros(n, dtype=np.int32)
    lib.decode_jpeg_letterbox_batch_rect(
        ptrs, lens, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        canvas_h, canvas_w, int(pad_value), int(scale_target),
        int(dct_scale_target),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        errs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out, dims, errs
