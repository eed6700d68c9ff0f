"""
Process-pool image loader worker.

Kept in its own module so worker processes import only numpy/PIL/cv2 —
NEVER jax (backend initialization in a forked worker is slow and, with a
remote TPU, unsafe). Implements the load + EXIF-rotate + letterbox step
of the input pipeline for the multiprocessing loader mode (the analog of
the reference's producer processes, run_detector_batch.py:124-200).
"""

import numpy as np

FAILURE_IMAGE_OPEN = 'image access failure'


# Per-process view of the detector's max_canvases compile-guard: each
# worker process tracks the auto canvases it has emitted per
# (image_size, stride) and falls back to the square canvas beyond the
# cap, bounding total compiled shapes at ~n_processes * cap worst case
_SEEN_AUTO_CANVASES = {}


def _auto_target_shape(shape_hw, image_size, stride, scaleup=True,
                       max_canvases=None):
    """Minimal stride-multiple canvas (single source of truth:
    ops/boxes.auto_target_shape), with the per-process compile-guard."""

    from megadetector_tpu.ops.boxes import auto_target_shape
    t = auto_target_shape(shape_hw, image_size, stride=stride,
                          scaleup=scaleup)
    if max_canvases is None:
        return t
    seen = _SEEN_AUTO_CANVASES.setdefault((image_size, stride), set())
    if t == (image_size, image_size) or t in seen:
        return t
    if len(seen) >= max_canvases:
        return (image_size, image_size)
    seen.add(t)
    return t


def load_and_letterbox(args):
    """
    Worker entry: (im_file, image_size, stride, compatibility_mode,
    preprocess_mode[, max_staging_side[, use_native_loader[,
    canvas_mode[, max_canvases]]]]) -> (im_file, info dict or failure
    string). The info dict matches TPUDetector.preprocess_image()'s
    contract.

    canvas_mode 'auto' letterboxes onto the minimal stride-multiple
    rectangle (the reference's behavior); 'square' (default) onto the
    full square canvas. max_canvases applies the detector's
    compile-guard per worker process (square fallback beyond the cap);
    shape grouping downstream handles whatever arrives.
    """

    (im_file, image_size, stride, compatibility_mode,
     preprocess_mode) = args[:5]
    max_staging_side = args[5] if len(args) > 5 else None
    use_native_loader = bool(args[6]) if len(args) > 6 else False
    canvas_mode = args[7] if len(args) > 7 else 'square'
    max_canvases = args[8] if len(args) > 8 else None

    from megadetector_tpu.visualization.visualization_utils import \
        load_image
    from megadetector_tpu.ops import boxes as box_ops

    if use_native_loader and preprocess_mode == 'host' and \
            'classic' in compatibility_mode and \
            im_file.lower().endswith(('.jpg', '.jpeg')):
        info = _native_load(im_file, image_size, stride, canvas_mode,
                            max_canvases)
        if info is not None:
            return im_file, info
        # else fall through to the PIL/cv2 path (non-RGB JPEG, mirrored
        # EXIF orientation, or decode error — the Python path decides
        # whether it is a real failure)

    if use_native_loader and preprocess_mode == 'device' and \
            'classic' in compatibility_mode and \
            im_file.lower().endswith(('.jpg', '.jpeg')):
        # Device-preprocess staging via native DCT-scaled decode: the
        # JPEG decodes directly near the inference size (libjpeg
        # scale_num/8, always >= image_size on the long side), so the
        # staging canvas the TPU letterbox reads shrinks ~4x vs
        # full-resolution staging (measured gap analysis:
        # experiments/exp_device_preprocess_rect.py). Normalized output
        # coordinates are scale-invariant, so scaling_shape tracks the
        # scaled image. Perf mode: DCT-scaled decode deviates from
        # full-resolution-resize parity.
        info = _native_load_device(im_file, image_size, stride,
                                   canvas_mode, max_canvases)
        if info is not None:
            return im_file, info

    try:
        image = load_image(im_file)
        img_original = np.asarray(image)
    except Exception:
        return im_file, FAILURE_IMAGE_OPEN

    scaling_shape = img_original.shape
    info = {'file': im_file,
            'scaling_shape': scaling_shape,
            'img_original_pil': None}

    auto = (canvas_mode == 'auto')

    try:
        if preprocess_mode == 'device':
            # Same >max_staging_side host pre-shrink that
            # TPUDetector.preprocess_image applies: bounds the staging
            # canvas so huge images don't trigger a new XLA compile per
            # distinct size. Normalized coords are scale-invariant, so
            # scaling_shape tracks the shrunk image.
            max_side = int(max_staging_side or 4096)
            info['original_shape'] = img_original.shape
            if max(img_original.shape[:2]) > max_side:
                img_original, _ = box_ops.resize_long_side(
                    img_original, max_side)
                info['scaling_shape'] = img_original.shape
            if auto:
                target = _auto_target_shape(
                    img_original.shape[:2], image_size, stride,
                    max_canvases=max_canvases)
            else:
                target = (image_size, image_size)
            info['img_processed'] = None
            info['img_original'] = img_original
            info['target_shape'] = target
            info['scale_target'] = image_size
            info['letterbox_ratio'] = None
            info['letterbox_pad'] = None
            return im_file, info

        if 'classic' in compatibility_mode:
            if auto and max_canvases is not None:
                t = _auto_target_shape(img_original.shape[:2],
                                       image_size, stride,
                                       max_canvases=max_canvases)
                auto = (t != (image_size, image_size)) or \
                    _auto_target_shape(img_original.shape[:2],
                                       image_size, stride) == t
            img, ratio, pad = box_ops.letterbox(
                img_original, new_shape=(image_size, image_size),
                stride=stride, auto=auto, scaleup=True)
        else:
            use_ceil = 'use_ceil_for_resize' in compatibility_mode
            img_original, _ = box_ops.resize_long_side(
                img_original, image_size, use_ceil=use_ceil)
            if auto and max_canvases is not None:
                t = _auto_target_shape(img_original.shape[:2],
                                       image_size, stride,
                                       scaleup=False,
                                       max_canvases=max_canvases)
                auto = (t != (image_size, image_size)) or \
                    _auto_target_shape(img_original.shape[:2],
                                       image_size, stride,
                                       scaleup=False) == t
            img, ratio, pad = box_ops.letterbox(
                img_original, new_shape=(image_size, image_size),
                stride=stride, auto=auto, scaleup=False)

        info['img_processed'] = img
        info['img_original'] = img_original
        info['target_shape'] = img.shape[:2]
        info['letterbox_ratio'] = ratio
        info['letterbox_pad'] = pad
        return im_file, info
    except Exception:
        return im_file, FAILURE_IMAGE_OPEN


def _native_load_device(im_file, image_size, stride=64,
                        canvas_mode='square', max_canvases=None):
    """
    Fused native DCT-scaled decode (no letterbox) for device-preprocess
    staging; returns an info dict or None for the PIL fallback.
    """

    from megadetector_tpu import native

    if not native.jpeg_loader_available():
        return None
    try:
        with open(im_file, 'rb') as f:
            data = f.read()
        img = native.decode_jpeg_scaled(data,
                                        dct_scale_target=image_size)
    except Exception:
        return None

    if canvas_mode == 'auto':
        target = _auto_target_shape(img.shape[:2], image_size, stride,
                                    max_canvases=max_canvases)
    else:
        target = (image_size, image_size)
    return {
        'file': im_file,
        'scaling_shape': img.shape,
        'img_original_pil': None,
        'img_processed': None,
        'img_original': img,
        'target_shape': target,
        'scale_target': image_size,
        'letterbox_ratio': None,
        'letterbox_pad': None,
    }


def _native_load(im_file, image_size, stride=64, canvas_mode='square',
                 max_canvases=None):
    """
    Fused native decode + EXIF rotation + letterbox (C++/libjpeg; see
    native/jpeg_loader.cpp). Returns an info dict, or None to fall back
    to the Python path. Performance mode: decode rounding can differ
    from PIL by a couple of levels, so parity-critical runs keep the
    default PIL/cv2 loader.

    In 'auto' canvas mode the target rectangle comes from the JPEG
    header dimensions (PIL reads them without decoding) and the EXIF
    orientation, then the C++ kernel decodes straight onto that canvas.
    """

    from megadetector_tpu import native

    if not native.jpeg_loader_available():
        return None
    try:
        with open(im_file, 'rb') as f:
            data = f.read()

        canvas_hw = int(image_size)
        if canvas_mode == 'auto':
            import io
            from PIL import Image
            with Image.open(io.BytesIO(data)) as pim:
                w0, h0 = pim.size  # header only, no decode
                try:
                    orientation = pim.getexif().get(274, 1)
                except Exception:
                    orientation = 1
            if orientation in (6, 8):
                h0, w0 = w0, h0  # post-rotation dims
            canvas_hw = _auto_target_shape((h0, w0), image_size, stride,
                                           max_canvases=max_canvases)

        canvas, (h, w) = native.decode_jpeg_letterbox(
            data, canvas_hw, pad_value=114,
            scale_target=int(image_size))
    except Exception:
        return None

    # Mirror ops/boxes.letterbox geometry bookkeeping: the C++ kernel
    # now derives the ratio from the square scale target and rounds
    # half-to-even, exactly like letterbox(auto=True)
    ch, cw = canvas.shape[:2]
    r = min(image_size / h, image_size / w)
    new_w = min(int(round(w * r)), cw)
    new_h = min(int(round(h * r)), ch)
    dw = (cw - new_w) / 2.0
    dh = (ch - new_h) / 2.0
    return {
        'file': im_file,
        'scaling_shape': (h, w, 3),
        'img_original_pil': None,
        'img_original': None,
        'img_processed': canvas,
        'target_shape': canvas.shape[:2],
        'letterbox_ratio': (r, r),
        'letterbox_pad': (dw, dh),
    }
