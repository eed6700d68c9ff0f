"""
The 0.005 output-floor contract (reference run_detector.py:251): the
reference's nms() is uncapped (pytorch_detector.py:502-610), while the
fixed-shape candidate selection holds pre_nms_topk candidates. These
tests pin the capacity-escalation behavior: when more candidates pass
the floor than the selection holds, the batch re-runs through a
program with the next power-of-two capacity (up to max_pre_nms_topk),
so nothing is dropped; only beyond the cap (or with escalation
disabled) do affected images get a 'pre_nms_truncation' field and a
warning.
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


@pytest.fixture(scope='module')
def crowded_image():
    """A random-weight model at a 256 canvas produces ~1-4k candidates
    above the 0.005 floor — far beyond the default pre_nms_topk of
    512."""

    rng = np.random.RandomState(0)
    return rng.randint(0, 255, (256, 256, 3), dtype=np.uint8)


def test_escalation_keeps_the_tail(checkpoint, crowded_image):
    """Default behavior: capacity escalates until every above-floor
    candidate is held — identical output to a detector built with a
    big capacity from the start, and no truncation flag."""

    det = TPUDetector(checkpoint)
    assert det.pre_nms_topk == 512 and det.auto_escalate_topk

    r = det.generate_detections_one_image(
        crowded_image, 'crowded.jpg', detection_threshold=0.005)
    assert r['detections'] is not None
    assert 'pre_nms_truncation' not in r
    assert det.n_truncated_images == 0

    big = TPUDetector(checkpoint,
                      detector_options={'pre_nms_topk': 8192,
                                        'auto_escalate_topk': 'false'})
    r_big = big.generate_detections_one_image(
        crowded_image, 'crowded.jpg', detection_threshold=0.005)
    assert r['detections'] == r_big['detections']


def test_flag_when_escalation_capped(checkpoint, crowded_image, capsys):
    """Beyond max_pre_nms_topk the tail is genuinely dropped and the
    image is flagged with the true count."""

    det = TPUDetector(checkpoint,
                      detector_options={'max_pre_nms_topk': 512})
    r = det.generate_detections_one_image(
        crowded_image, 'capped.jpg', detection_threshold=0.005)
    assert r.get('pre_nms_truncation', 0) > 512
    assert det.n_truncated_images == 1
    assert 'candidate' in capsys.readouterr().out


def test_flag_when_escalation_disabled(checkpoint, crowded_image):
    det = TPUDetector(checkpoint,
                      detector_options={'auto_escalate_topk': 'false'})
    r = det.generate_detections_one_image(
        crowded_image, 'noesc.jpg', detection_threshold=0.005)
    assert r.get('pre_nms_truncation', 0) > 512
    assert det.n_truncated_images == 1


def test_no_flag_at_typical_threshold(checkpoint):
    """At a high threshold the candidate count is tiny; no escalation,
    no flag (the count respects the requested floor)."""

    det = TPUDetector(checkpoint,
                      detector_options={'auto_escalate_topk': 'false'})
    img = np.full((256, 256, 3), 114, dtype=np.uint8)
    r = det.generate_detections_one_image(img, 'quiet.jpg',
                                          detection_threshold=0.97)
    assert 'pre_nms_truncation' not in r


def test_unfused_path_also_escalates(checkpoint, crowded_image):
    """The unfused decode path (batched_nms) escalates identically."""

    det = TPUDetector(checkpoint,
                      detector_options={'fused_decode': 'false'})
    r = det.generate_detections_one_image(
        crowded_image, 'crowded2.jpg', detection_threshold=0.005)
    assert 'pre_nms_truncation' not in r
    assert det.n_truncated_images == 0
