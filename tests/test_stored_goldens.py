"""
Stored golden-file regression tier.

The reference pins behavior with expected-results JSONs committed next
to the test package and compares at fixed tolerances
(/root/reference/megadetector/utils/md_tests.py:82,221-314). Real MDv5
weights are unavailable in this environment (zero egress), so the
golden here pins the full pipeline (classic letterbox -> forward ->
NMS -> coordinate mapback -> MD emission) over the deterministic stub
forward: any unintended change to preprocessing geometry, NMS
semantics, rounding, or output formatting across rounds fails this
tier at the reference tolerances.

Regenerate intentionally with:
    MD_REGEN_GOLDENS=1 python -m pytest tests/test_stored_goldens.py
"""

import json
import os

import numpy as np
import pytest

from megadetector_tpu.models import yolov5
from megadetector_tpu.models.convert_weights import save_checkpoint
from megadetector_tpu.utils import md_tests as comparator

from stub_model import make_stub_detector
from test_reference_golden import _structured_images, IMAGE_SIZE

GOLDEN_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'data', 'stub_golden_results.json')

SIZES = [(256, 256), (192, 320), (330, 190)]


@pytest.fixture(scope='module')
def stub_detector(tmp_path_factory):
    config = yolov5.YoloV5Config('yolov5n', num_classes=3)
    folder = tmp_path_factory.mktemp('stub_golden_model')
    path = str(folder / 'stub.npz')
    save_checkpoint(yolov5.init_params(config, seed=0), path, {
        'arch': 'yolov5n',
        'model_type': 'yolov5',
        'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': IMAGE_SIZE,
    })
    # The golden was generated on the square canvas; pin that mode
    # (canvas_mode='auto' has its own golden below)
    return make_stub_detector(path, {'canvas_mode': 'square'})


def _run_pipeline(detector):
    results = []
    for i, img in enumerate(_structured_images(SIZES)):
        r = detector.generate_detections_one_image(
            img, image_id='golden_{:02d}.jpg'.format(i),
            detection_threshold=0.005)
        results.append(r)
    return {'images': results}


def test_pipeline_matches_stored_golden(stub_detector):
    got = _run_pipeline(stub_detector)

    if os.environ.get('MD_REGEN_GOLDENS'):
        os.makedirs(os.path.dirname(GOLDEN_FILE), exist_ok=True)
        with open(GOLDEN_FILE, 'w') as f:
            json.dump(got, f, indent=1)
        pytest.skip('goldens regenerated at {}'.format(GOLDEN_FILE))

    assert os.path.isfile(GOLDEN_FILE), \
        'Golden file missing; regenerate with MD_REGEN_GOLDENS=1'
    with open(GOLDEN_FILE) as f:
        expected = json.load(f)

    options = comparator.MDTestOptions()
    options.comparison_confidence_threshold = 0.005
    options.iou_match_threshold = 0.85
    options.max_conf_error = 0.005
    options.max_coord_error = 0.001

    assert len(got['images']) == len(expected['images'])
    for got_im, exp_im in zip(got['images'], expected['images']):
        assert got_im['file'] == exp_im['file']
        result = comparator.compare_detection_lists(
            exp_im['detections'], got_im['detections'],
            options=options, image_id=got_im['file'])
        assert result['errors'] == [], result['errors']


def test_golden_file_is_committed():
    """The stored golden must exist in the repo (regen-skip must not
    silently disable the tier on CI)."""

    if os.environ.get('MD_REGEN_GOLDENS'):
        pytest.skip('regenerating')
    assert os.path.isfile(GOLDEN_FILE)


DEVICE_GOLDEN_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), 'data',
    'stub_golden_results_device.json')


@pytest.fixture(scope='module')
def stub_detector_device(tmp_path_factory):
    config = yolov5.YoloV5Config('yolov5n', num_classes=3)
    folder = tmp_path_factory.mktemp('stub_golden_model_dev')
    path = str(folder / 'stub.npz')
    save_checkpoint(yolov5.init_params(config, seed=0), path, {
        'arch': 'yolov5n',
        'model_type': 'yolov5',
        'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': IMAGE_SIZE,
    })
    return make_stub_detector(path, {'preprocess_mode': 'device',
                                     'canvas_mode': 'square'})


def test_device_preprocess_matches_stored_golden(stub_detector_device):
    """Pins the on-device matmul letterbox + stub forward: any change
    to the device-preprocess geometry or interpolation semantics
    across rounds fails here at the reference tolerances."""

    got = _run_pipeline(stub_detector_device)

    if os.environ.get('MD_REGEN_GOLDENS'):
        os.makedirs(os.path.dirname(DEVICE_GOLDEN_FILE), exist_ok=True)
        with open(DEVICE_GOLDEN_FILE, 'w') as f:
            json.dump(got, f, indent=1)
        pytest.skip('device goldens regenerated')

    assert os.path.isfile(DEVICE_GOLDEN_FILE), \
        'Golden file missing; regenerate with MD_REGEN_GOLDENS=1'
    with open(DEVICE_GOLDEN_FILE) as f:
        expected = json.load(f)

    options = comparator.MDTestOptions()
    options.comparison_confidence_threshold = 0.005
    options.iou_match_threshold = 0.85
    options.max_conf_error = 0.005
    options.max_coord_error = 0.001

    assert len(got['images']) == len(expected['images'])
    for got_im, exp_im in zip(got['images'], expected['images']):
        assert got_im['file'] == exp_im['file']
        result = comparator.compare_detection_lists(
            exp_im['detections'], got_im['detections'],
            options=options, image_id=got_im['file'])
        assert result['errors'] == [], result['errors']


#%% Auto-canvas (minimal stride-rectangle) goldens
#
# canvas_mode='auto' is the production default: each image letterboxes
# onto its minimal stride-multiple rectangle like the reference
# (pytorch_detector.py:1064-1068). These goldens pin the rectangular
# pipeline — host letterbox and the on-device matmul letterbox — so
# geometry changes across rounds fail at the reference tolerances.

AUTO_GOLDEN_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), 'data',
    'stub_golden_results_auto.json')

AUTO_DEVICE_GOLDEN_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), 'data',
    'stub_golden_results_auto_device.json')


def _make_auto_detector(tmp_path_factory, name, extra_options=None):
    config = yolov5.YoloV5Config('yolov5n', num_classes=3)
    folder = tmp_path_factory.mktemp(name)
    path = str(folder / 'stub.npz')
    save_checkpoint(yolov5.init_params(config, seed=0), path, {
        'arch': 'yolov5n',
        'model_type': 'yolov5',
        'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': IMAGE_SIZE,
    })
    options = {'canvas_mode': 'auto'}
    options.update(extra_options or {})
    return make_stub_detector(path, options)


def _check_against_golden(got, golden_file):
    if os.environ.get('MD_REGEN_GOLDENS'):
        os.makedirs(os.path.dirname(golden_file), exist_ok=True)
        with open(golden_file, 'w') as f:
            json.dump(got, f, indent=1)
        pytest.skip('goldens regenerated at {}'.format(golden_file))

    assert os.path.isfile(golden_file), \
        'Golden file missing; regenerate with MD_REGEN_GOLDENS=1'
    with open(golden_file) as f:
        expected = json.load(f)

    options = comparator.MDTestOptions()
    options.comparison_confidence_threshold = 0.005
    options.iou_match_threshold = 0.85
    options.max_conf_error = 0.005
    options.max_coord_error = 0.001

    assert len(got['images']) == len(expected['images'])
    for got_im, exp_im in zip(got['images'], expected['images']):
        assert got_im['file'] == exp_im['file']
        result = comparator.compare_detection_lists(
            exp_im['detections'], got_im['detections'],
            options=options, image_id=got_im['file'])
        assert result['errors'] == [], result['errors']


def test_auto_canvas_matches_stored_golden(tmp_path_factory):
    detector = _make_auto_detector(tmp_path_factory, 'stub_auto')
    got = _run_pipeline(detector)
    # Non-square inputs really did letterbox onto rectangles
    assert any(s[0] != s[1] for s in detector._auto_canvases), \
        'auto mode produced no rectangular canvases'
    _check_against_golden(got, AUTO_GOLDEN_FILE)


def test_auto_canvas_device_matches_stored_golden(tmp_path_factory):
    detector = _make_auto_detector(
        tmp_path_factory, 'stub_auto_dev', {'preprocess_mode': 'device'})
    got = _run_pipeline(detector)
    _check_against_golden(got, AUTO_DEVICE_GOLDEN_FILE)


#%% TTA (augment) golden
#
# The TTA recipe is pinned against a torch implementation of yolov5's
# forward_augment in tests/test_tta_parity.py; this golden additionally
# pins it across toolchain updates (resize/pad numerics, merge order).

TTA_GOLDEN_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), 'data',
    'stub_golden_results_tta.json')


def test_tta_matches_stored_golden(tmp_path_factory):
    detector = _make_auto_detector(tmp_path_factory, 'stub_tta',
                                   {'pre_nms_topk': 640})
    results = []
    for i, img in enumerate(_structured_images(SIZES)):
        r = detector.generate_detections_one_image(
            img, image_id='golden_{:02d}.jpg'.format(i),
            detection_threshold=0.005, augment=True)
        results.append(r)
    _check_against_golden({'images': results}, TTA_GOLDEN_FILE)
