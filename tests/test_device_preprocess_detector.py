"""Detector-level parity: device-preprocess mode vs host-preprocess mode."""

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
        'image_size': 64, 'anchors': cfg.anchors.tolist(),
    })
    return path


def test_device_mode_matches_host_mode(tiny_checkpoint):
    from megadetector_tpu.models.detector import TPUDetector

    host_det = TPUDetector(tiny_checkpoint,
                           {'preprocess_mode': 'host'})
    device_det = TPUDetector(tiny_checkpoint,
                             {'preprocess_mode': 'device'})

    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            for (h, w) in [(60, 80), (80, 60), (64, 64)]]
    ids = ['im{}.jpg'.format(i) for i in range(3)]

    host_out = host_det.generate_detections_one_batch(
        list(imgs), list(ids), detection_threshold=0.1)
    device_out = device_det.generate_detections_one_batch(
        list(imgs), list(ids), detection_threshold=0.1)

    # IoU-matched tolerance comparison (the golden-harness comparator):
    # random weights produce many near-threshold detections, so compare
    # well above the output floor and allow the device resize's rounding
    # differences
    from megadetector_tpu.utils.md_tests import (MDTestOptions,
                                                 compare_detection_lists)
    options = MDTestOptions()
    options.comparison_confidence_threshold = 0.2
    options.iou_match_threshold = 0.7
    options.max_conf_error = 0.03
    options.max_coord_error = 0.03

    total_matched = 0
    total_errors = 0
    for h_im, d_im in zip(host_out, device_out):
        assert h_im['file'] == d_im['file']
        r = compare_detection_lists(h_im['detections'],
                                    d_im['detections'], options,
                                    image_id=h_im['file'])
        total_matched += len(r['matched'])
        total_errors += len(r['errors'])
    # The confident detection sets must broadly agree
    assert total_matched > 0
    assert total_errors <= max(1, total_matched // 5), \
        '{} errors vs {} matches'.format(total_errors, total_matched)


def test_h2_emission_matches_plain_device_mode(tiny_checkpoint):
    """With folded_h2=true, the device letterbox emits the folded stem
    layout itself (preprocess_device fold_layout='h2'); detections must
    match the plain device path at tight tolerance (the h2 l0 is an
    exact MAC-set rewrite; only f32 reduction order differs)."""

    from megadetector_tpu.models.detector import TPUDetector

    plain = TPUDetector(tiny_checkpoint,
                        {'preprocess_mode': 'device'})
    h2 = TPUDetector(tiny_checkpoint,
                     {'preprocess_mode': 'device', 'folded_h2': 'true'})
    assert not plain._stem_layout_h2()
    assert h2._stem_layout_h2(), 'h2 fold did not engage'

    rng = np.random.RandomState(5)
    imgs = [rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            for (h, w) in [(60, 80), (64, 64)]]
    ids = ['im{}.jpg'.format(i) for i in range(len(imgs))]

    out_plain = plain.generate_detections_one_batch(
        list(imgs), list(ids), detection_threshold=0.1)
    out_h2 = h2.generate_detections_one_batch(
        list(imgs), list(ids), detection_threshold=0.1)

    from megadetector_tpu.utils.md_tests import (MDTestOptions,
                                                 compare_detection_lists)
    options = MDTestOptions()
    options.comparison_confidence_threshold = 0.2
    options.iou_match_threshold = 0.8
    options.max_conf_error = 0.01
    options.max_coord_error = 0.01

    total_matched, total_errors = 0, 0
    for p_im, h_im in zip(out_plain, out_h2):
        assert p_im['file'] == h_im['file']
        r = compare_detection_lists(p_im['detections'],
                                    h_im['detections'], options,
                                    image_id=p_im['file'])
        total_matched += len(r['matched'])
        total_errors += len(r['errors'])
    assert total_matched > 0
    assert total_errors == 0, \
        '{} errors vs {} matches'.format(total_errors, total_matched)
