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


def load_and_letterbox(args):
    """
    Worker entry: (im_file, image_size, stride, compatibility_mode,
    preprocess_mode[, max_staging_side]) -> (im_file, info dict or
    failure string). The info dict matches
    TPUDetector.preprocess_image()'s contract.
    """

    (im_file, image_size, stride, compatibility_mode,
     preprocess_mode) = args[:5]
    max_staging_side = args[5] if len(args) > 5 else None

    from megadetector_tpu.visualization.visualization_utils import \
        load_image
    from megadetector_tpu.ops import boxes as box_ops

    try:
        image = load_image(im_file)
        img_original = np.asarray(image)
    except Exception:
        return im_file, FAILURE_IMAGE_OPEN

    scaling_shape = img_original.shape
    info = {'file': im_file,
            'scaling_shape': scaling_shape,
            'img_original_pil': None}

    try:
        if preprocess_mode == 'device':
            # Same >max_staging_side host pre-shrink that
            # TPUDetector.preprocess_image applies: bounds the staging
            # canvas so huge images don't trigger a new XLA compile per
            # distinct size. Normalized coords are scale-invariant, so
            # scaling_shape tracks the shrunk image.
            max_side = int(max_staging_side or 4096)
            if max(img_original.shape[:2]) > max_side:
                img_original, _ = box_ops.resize_long_side(
                    img_original, max_side)
                info['scaling_shape'] = img_original.shape
            info['img_processed'] = None
            info['img_original'] = img_original
            info['target_shape'] = (image_size, image_size)
            info['letterbox_ratio'] = None
            info['letterbox_pad'] = None
            return im_file, info

        if 'classic' in compatibility_mode:
            img, ratio, pad = box_ops.letterbox(
                img_original, new_shape=(image_size, image_size),
                stride=stride, auto=False, scaleup=True)
        else:
            use_ceil = 'use_ceil_for_resize' in compatibility_mode
            img_original, _ = box_ops.resize_long_side(
                img_original, image_size, use_ceil=use_ceil)
            img, ratio, pad = box_ops.letterbox(
                img_original, new_shape=(image_size, image_size),
                stride=stride, auto=False, scaleup=False)

        info['img_processed'] = img
        info['img_original'] = img_original
        info['target_shape'] = img.shape[:2]
        info['letterbox_ratio'] = ratio
        info['letterbox_pad'] = pad
        return im_file, info
    except Exception:
        return im_file, FAILURE_IMAGE_OPEN
