"""Modern compatibility-mode preprocessing path tests."""

import numpy as np
import pytest

from megadetector_tpu.models import yolov5
from megadetector_tpu.models.convert_weights import save_checkpoint


@pytest.fixture(scope='module')
def tiny_checkpoint(tmp_path_factory):
    folder = tmp_path_factory.mktemp('model')
    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    params = yolov5.init_params(cfg, seed=7)
    path = str(folder / 'md_test.npz')
    save_checkpoint(params, path, {
        'model_version_string': 'v5a.0.1', 'arch': 'yolov5n',
        'model_type': 'yolov5', 'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': 64, 'anchors': cfg.anchors.tolist()})
    return path


def test_modern_mode_runs_and_agrees_with_classic(tiny_checkpoint):
    from megadetector_tpu.models.detector import TPUDetector
    from megadetector_tpu.utils.md_tests import (MDTestOptions,
                                                 compare_detection_lists)

    classic = TPUDetector(tiny_checkpoint,
                          {'compatibility_mode': 'classic'})
    modern = TPUDetector(tiny_checkpoint,
                         {'compatibility_mode': 'modern'})

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (100, 140, 3), dtype=np.uint8)

    c = classic.generate_detections_one_image(img, 'x.jpg',
                                              detection_threshold=0.2)
    m = modern.generate_detections_one_image(img, 'x.jpg',
                                             detection_threshold=0.2)
    assert c['detections'] is not None and m['detections'] is not None

    # Modern rounds instead of truncating; otherwise the two modes see
    # slightly different resampled pixels — compare with loose tolerance
    options = MDTestOptions()
    options.comparison_confidence_threshold = 0.22
    options.iou_match_threshold = 0.6
    options.max_conf_error = 0.05
    options.max_coord_error = 0.05
    r = compare_detection_lists(c['detections'], m['detections'],
                                options, image_id='x.jpg')
    assert len(r['matched']) > 0


def test_modern_mode_rounds_not_truncates(tiny_checkpoint):
    from megadetector_tpu.models.detector import TPUDetector
    modern = TPUDetector(tiny_checkpoint,
                         {'compatibility_mode': 'modern'})
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (80, 80, 3), dtype=np.uint8)
    out = modern.generate_detections_one_image(img, 'x.jpg',
                                               detection_threshold=0.1)
    for det in out['detections']:
        # Rounded values: conf has <= 3 decimals, coords <= 4
        assert det['conf'] == round(det['conf'], 3)
        for v in det['bbox']:
            assert v == round(v, 4)


def test_use_ceil_for_resize_mode(tiny_checkpoint):
    from megadetector_tpu.models.detector import TPUDetector
    detector = TPUDetector(
        tiny_checkpoint,
        {'compatibility_mode': 'modern,use_ceil_for_resize'})
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (99, 131, 3), dtype=np.uint8)
    out = detector.generate_detections_one_image(img, 'x.jpg',
                                                 detection_threshold=0.2)
    assert out['detections'] is not None
