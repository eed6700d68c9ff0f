"""
Compatibility surface for the reference's rfdetr_detector module
(reference: megadetector/detection/rfdetr_detector.py). RF-DETR
inference in this framework runs through the JAX implementation in
models/rfdetr.py behind the standard TPUDetector protocol; these names
keep reference-style imports working:

- RFDETRDetector -> TPUDetector (dispatches to the RF-DETR decode path
  when the checkpoint metadata says model_type == 'rfdetr')
- load_model() -> converts (if needed) and loads an RF-DETR checkpoint,
  returning the reference's dict shape
- convert_detections_to_md_format() -> absolute-xyxy detections to
  normalized MD dicts
"""

from megadetector_tpu.models.detector import TPUDetector as RFDETRDetector  # noqa: F401
from megadetector_tpu.utils.ct_utils import round_float, \
    round_float_array

CONF_DIGITS = 3
COORD_DIGITS = 4


def load_model(detector_file, image_size=None,
               optimize_for_inference=False, batch_size=1,
               compile=None, dtype=None):
    """
    Load an RF-DETR model (reference: rfdetr_detector.py:34-166).
    [detector_file] is a converted checkpoint (.npz; run
    models/convert_weights.convert_rfdetr_checkpoint on a torch .pth
    first — offline conversion replaces the reference's
    rfdetr.from_checkpoint). The torch-specific knobs
    (optimize_for_inference/batch_size/compile) are accepted for
    signature parity; XLA compilation is always on and per-shape.

    Returns a dict with 'model' (a TPUDetector), 'model_type',
    'image_size', and 'detection_categories'.
    """

    detector_options = {}
    if image_size is not None:
        detector_options['image_size'] = image_size
    if dtype is not None:
        detector_options['dtype'] = \
            'bfloat16' if str(dtype) == 'float16' else str(dtype)

    detector = RFDETRDetector(detector_file,
                              detector_options=detector_options)

    from megadetector_tpu.models.registry import \
        read_metadata_from_model_file
    metadata = read_metadata_from_model_file(detector_file) or {}

    return {
        'model': detector,
        'model_type': metadata.get('architecture',
                                   metadata.get('model_type',
                                                'rfdetr')),
        'image_size': getattr(detector, 'default_image_size', None),
        'detection_categories': metadata.get('detection_categories'),
    }


def convert_detections_to_md_format(detections, image_width,
                                    image_height):
    """
    Convert absolute-pixel xyxy detections to MD format (reference:
    rfdetr_detector.py:169-228). [detections] is any object with
    .xyxy [n, 4], .confidence [n], and .class_id [n] attributes (the
    supervision Detections layout), or None. Returns a list of MD
    detection dicts with clamped, rounded normalized boxes.
    """

    md_detections = []
    if detections is None or len(detections) == 0:
        return md_detections

    for i in range(len(detections)):
        x1, y1, x2, y2 = detections.xyxy[i]
        x_min_norm = max(0.0, min(1.0, float(x1) / image_width))
        y_min_norm = max(0.0, min(1.0, float(y1) / image_height))
        width_norm = max(0.0, min(1.0 - x_min_norm,
                                  float(x2 - x1) / image_width))
        height_norm = max(0.0, min(1.0 - y_min_norm,
                                   float(y2 - y1) / image_height))

        md_detections.append({
            'category': str(int(detections.class_id[i])),
            'conf': round_float(float(detections.confidence[i]),
                                precision=CONF_DIGITS),
            'bbox': round_float_array(
                [x_min_norm, y_min_norm, width_norm, height_norm],
                precision=COORD_DIGITS),
        })
    return md_detections
