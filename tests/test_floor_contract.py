"""
The 0.005 output-floor contract (reference run_detector.py:251): the
fixed-shape candidate selection truncates at pre_nms_topk where the
reference's nms() is uncapped (pytorch_detector.py:502-610). These tests
pin the overflow indicator: when more candidates pass the floor than the
selection keeps, the affected image results carry a 'pre_nms_truncation'
field with the true count and the detector counts the event.
"""

import numpy as np
import pytest

from megadetector_tpu.models import yolov5
from megadetector_tpu.models.convert_weights import save_checkpoint
from megadetector_tpu.models.detector import TPUDetector


@pytest.fixture(scope='module')
def checkpoint(tmp_path_factory):
    folder = tmp_path_factory.mktemp('floor_model')
    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    path = str(folder / 'floor_test.npz')
    save_checkpoint(yolov5.init_params(cfg, seed=13), path, {
        'arch': 'yolov5n', 'model_type': 'yolov5', 'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': 256, 'anchors': cfg.anchors.tolist()})
    return path


def test_overflow_is_flagged_beyond_512(checkpoint, capsys):
    """A random-weight model at a 256 canvas produces ~4k candidates
    above the 0.005 floor — far beyond the default pre_nms_topk of 512 —
    so the truncation indicator must fire with the true count."""

    det = TPUDetector(checkpoint)
    assert det.pre_nms_topk == 512

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (256, 256, 3), dtype=np.uint8)
    r = det.generate_detections_one_image(img, 'crowded.jpg',
                                          detection_threshold=0.005)

    assert r['detections'] is not None
    assert 'pre_nms_truncation' in r, \
        'truncation beyond pre_nms_topk was not flagged'
    assert r['pre_nms_truncation'] > 512
    assert det.n_truncated_images == 1
    assert 'pre_nms_topk' in capsys.readouterr().out


def test_no_flag_when_topk_suffices(checkpoint):
    """With pre_nms_topk above the candidate count, no flag and no
    counter increment."""

    det = TPUDetector(checkpoint,
                      detector_options={'pre_nms_topk': 8192})
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (256, 256, 3), dtype=np.uint8)
    r = det.generate_detections_one_image(img, 'ok.jpg',
                                          detection_threshold=0.005)
    assert 'pre_nms_truncation' not in r
    assert det.n_truncated_images == 0


def test_no_flag_at_typical_threshold(checkpoint):
    """At a typical 0.2 threshold the candidate count is far smaller;
    the indicator counts only candidates above the requested floor, so
    a threshold that 512 easily covers must not flag. (Uses a blank
    image: random-weight logits still clear 0.005 everywhere but rarely
    0.97+; the count at 0.97 is zero.)"""

    det = TPUDetector(checkpoint)
    img = np.full((256, 256, 3), 114, dtype=np.uint8)
    r = det.generate_detections_one_image(img, 'quiet.jpg',
                                          detection_threshold=0.97)
    assert 'pre_nms_truncation' not in r


def test_unfused_path_also_counts(checkpoint):
    """The unfused decode path (batched_nms) reports the same
    indicator."""

    det = TPUDetector(checkpoint,
                      detector_options={'fused_decode': 'false'})
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (256, 256, 3), dtype=np.uint8)
    r = det.generate_detections_one_image(img, 'crowded2.jpg',
                                          detection_threshold=0.005)
    assert r.get('pre_nms_truncation', 0) > 512
