"""
Compatibility surface for the reference's pytorch_detector module
(reference: megadetector/detection/pytorch_detector.py). In this
framework the PyTorch inference class is replaced by the JAX/XLA
TPUDetector (models/detector.py), which exposes the same constructor
signature and detection protocol; the names here let code written
against the reference import path keep working:

- PTDetector -> TPUDetector (construction options documented there;
  model files are converted checkpoints, see models/convert_weights.py)
- nms() -> the on-device XLA NMS (ops/nms.py), returned in the
  reference's list-of-[n, 6]-arrays shape
- add/read_metadata_to/from_megadetector_model_file -> the registry's
  format-agnostic metadata functions, which handle both converted
  checkpoints and reference .pt zipfiles
"""

import numpy as np

from megadetector_tpu.models.detector import TPUDetector as PTDetector  # noqa: F401
from megadetector_tpu.models import registry


def nms(prediction, conf_thres=0.25, iou_thres=0.45, max_det=300):
    """
    Non-maximum suppression over raw decoded predictions
    (reference: pytorch_detector.py:502-614). [prediction] is
    [B, A, 5+C] (center-format boxes in canvas pixels, objectness,
    per-class confidences); returns a length-B list of [n, 6] float
    arrays (x1, y1, x2, y2, conf, class).
    """

    from megadetector_tpu.ops.nms import batched_nms

    prediction = np.asarray(prediction)
    out = batched_nms(prediction, conf_thres, iou_thres,
                      max_det=max_det)
    boxes = np.asarray(out['boxes'])
    scores = np.asarray(out['scores'])
    classes = np.asarray(out['classes'])
    valid = np.asarray(out['valid'])

    results = []
    for i in range(prediction.shape[0]):
        v = valid[i]
        results.append(np.concatenate([
            boxes[i][v],
            scores[i][v][:, None],
            classes[i][v][:, None].astype(np.float32)], axis=1))
    return results


def add_metadata_to_megadetector_model_file(
        model_file_in, model_file_out, metadata,
        destination_path='megadetector_info.json'):
    """
    Add a metadata .json to a model file, writing the result to
    [model_file_out] (reference: pytorch_detector.py:617-672).
    Delegates to the registry, which handles converted checkpoints
    (sidecar) and .pt zipfiles (in-archive) alike.
    """

    return registry.add_metadata_to_model_file(
        model_file_in, metadata, output_filename=model_file_out)


def read_metadata_from_megadetector_model_file(
        model_file, relative_path='megadetector_info.json',
        verbose=False):
    """
    Read embedded model metadata; returns a dict, or None if the model
    carries none (reference: pytorch_detector.py:674-728).
    """

    return registry.read_metadata_from_model_file(model_file,
                                                  verbose=verbose)
