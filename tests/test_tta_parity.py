"""
TTA (augment=True) parity against an independent torch implementation
of the reference's augmentation recipe (round-2 verdict weak item 6:
TTA parity was previously only self-referential fused==unfused). The
oracle implements yolov5's forward_augment / scale_img / _descale_pred
verbatim (tests/reference_pipeline.py); the deterministic stub forward
removes random-weight tie ambiguity, so both full pipelines must agree
at the golden tolerances.
"""

import numpy as np
import pytest

pytest.importorskip('torch')

from megadetector_tpu.models import yolov5
from megadetector_tpu.models.convert_weights import save_checkpoint
from megadetector_tpu.utils import md_tests as comparator

from reference_pipeline import reference_detect_one_image
from stub_model import NumpyStubModel, make_stub_detector
from test_reference_golden import _structured_images

IMAGE_SIZE = 256
STRIDE = 32


@pytest.fixture(scope='module')
def stub_pair(tmp_path_factory):
    config = yolov5.YoloV5Config('yolov5n', num_classes=3)
    folder = tmp_path_factory.mktemp('tta_stub')
    path = str(folder / 'stub.npz')
    save_checkpoint(yolov5.init_params(config, seed=0), path, {
        'arch': 'yolov5n', 'model_type': 'yolov5', 'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': IMAGE_SIZE,
    })
    # TTA triples the candidate pool; keep topk above it so the
    # fixed-shape selection matches the oracle's uncapped chain
    detector = make_stub_detector(path, {'pre_nms_topk': 640})
    return NumpyStubModel(), detector


def test_tta_matches_reference_recipe(stub_pair):
    oracle_model, detector = stub_pair

    options = comparator.MDTestOptions()
    options.comparison_confidence_threshold = 0.1
    options.iou_match_threshold = 0.85
    options.max_conf_error = 0.005
    options.max_coord_error = 0.001

    n_compared = 0
    sizes = [(1024, 1024), (1600, 1200), (1200, 1600)]
    for i, img in enumerate(_structured_images(sizes)):
        expected = reference_detect_one_image(
            oracle_model, img, IMAGE_SIZE, stride=STRIDE,
            detection_threshold=0.005, letterbox_auto=True,
            augment=True)
        got = detector.generate_detections_one_image(
            img, 'tta_{}.jpg'.format(i), detection_threshold=0.005,
            augment=True)
        r = comparator.compare_detection_lists(
            expected, got['detections'], options,
            image_id='tta_{}.jpg'.format(i))
        assert not r['errors'], \
            'TTA mismatch on image {}: {}'.format(i, r['errors'][:5])
        n_compared += len(r['matched'])
    assert n_compared >= 6, \
        'too few TTA detections compared ({})'.format(n_compared)


def test_tta_differs_from_single_pass(stub_pair):
    """Sanity: augmentation actually changes the output relative to a
    single-pass run (the recipe really runs)."""

    _, detector = stub_pair
    img = _structured_images([(1024, 1024)])[0]
    plain = detector.generate_detections_one_image(
        img, 'p.jpg', detection_threshold=0.005)
    tta = detector.generate_detections_one_image(
        img, 'p.jpg', detection_threshold=0.005, augment=True)
    assert plain['detections'] != tta['detections']
