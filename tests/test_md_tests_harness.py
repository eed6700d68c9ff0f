"""Tests for the golden-file comparison harness itself."""

import pytest

from megadetector_tpu.utils.md_tests import (MDTestOptions,
                                             compare_detection_lists,
                                             compare_results,
                                             output_files_are_identical)
from megadetector_tpu.utils import ct_utils


def _det(cat, conf, bbox):
    return {'category': cat, 'conf': conf, 'bbox': bbox}


def test_identical_lists_match():
    dets = [_det('1', 0.9, [0.1, 0.1, 0.2, 0.2]),
            _det('2', 0.5, [0.5, 0.5, 0.1, 0.1])]
    r = compare_detection_lists(dets, dets)
    assert len(r['matched']) == 2
    assert r['errors'] == []
    assert r['max_conf_error'] == 0.0


def test_tolerance_violations_reported():
    a = [_det('1', 0.9, [0.1, 0.1, 0.2, 0.2])]
    b = [_det('1', 0.88, [0.1005, 0.1, 0.2, 0.2])]  # conf off by 0.02
    r = compare_detection_lists(a, b)
    assert len(r['matched']) == 1
    assert any('conf error' in e for e in r['errors'])

    options = MDTestOptions()
    options.max_conf_error = 0.05
    r = compare_detection_lists(a, b, options)
    assert r['errors'] == []


def test_unmatched_detections_reported():
    a = [_det('1', 0.9, [0.1, 0.1, 0.2, 0.2])]
    b = [_det('1', 0.9, [0.6, 0.6, 0.2, 0.2])]  # different place
    r = compare_detection_lists(a, b)
    assert len(r['matched']) == 0
    assert len(r['errors']) == 2  # unmatched in A + extra in B


def test_category_must_match():
    a = [_det('1', 0.9, [0.1, 0.1, 0.2, 0.2])]
    b = [_det('2', 0.9, [0.1, 0.1, 0.2, 0.2])]
    r = compare_detection_lists(a, b)
    assert len(r['matched']) == 0


def test_below_threshold_ignored():
    a = [_det('1', 0.05, [0.1, 0.1, 0.2, 0.2])]
    b = []
    r = compare_detection_lists(a, b)
    assert r['errors'] == []


def test_compare_results_files(tmp_path):
    images = [
        {'file': 'x.jpg', 'detections': [
            _det('1', 0.9, [0.1, 0.1, 0.2, 0.2])]},
        {'file': 'y.jpg', 'detections': None,
         'failure': 'image access failure'},
    ]
    data = {'images': images, 'detection_categories': {'1': 'animal'},
            'info': {'format_version': '1.6'}}
    fa = str(tmp_path / 'a.json')
    fb = str(tmp_path / 'b.json')
    ct_utils.write_json(fa, data)
    ct_utils.write_json(fb, data)
    r = compare_results(fa, fb)
    assert r['errors'] == []
    assert r['n_images_compared'] == 1  # the failure is skipped

    # Failure mismatch is an error
    data2 = {'images': [
        {'file': 'x.jpg', 'detections': [
            _det('1', 0.9, [0.1, 0.1, 0.2, 0.2])]},
        {'file': 'y.jpg', 'detections': []},
    ], 'detection_categories': {'1': 'animal'}, 'info': {}}
    fc = str(tmp_path / 'c.json')
    ct_utils.write_json(fc, data2)
    r = compare_results(fa, fc)
    assert any('failure mismatch' in e for e in r['errors'])


def test_output_files_are_identical(tmp_path):
    d1 = {'images': [], 'detection_categories': {},
          'info': {'format_version': '1.6',
                   'detection_completion_time': '2026-01-01'}}
    d2 = {'images': [], 'detection_categories': {},
          'info': {'format_version': '1.6',
                   'detection_completion_time': '2026-02-02'}}
    f1 = str(tmp_path / '1.json')
    f2 = str(tmp_path / '2.json')
    ct_utils.write_json(f1, d1)
    ct_utils.write_json(f2, d2)
    # Identical modulo the volatile timestamp
    assert output_files_are_identical(f1, f2)
    d2['info']['format_version'] = '1.5'
    ct_utils.write_json(f2, d2)
    assert not output_files_are_identical(f1, f2)


def test_safe_iou_degenerate_boxes():
    from megadetector_tpu.utils.md_tests import _safe_iou
    # Identical degenerate boxes match
    assert _safe_iou([0.5, 0.5, 0.0, 0.1], [0.5, 0.5, 0.0, 0.1]) == 1.0
    # Different degenerate boxes don't
    assert _safe_iou([0.5, 0.5, 0.0, 0.1], [0.6, 0.5, 0.0, 0.1]) == 0.0
    # Normal boxes use real IoU
    assert _safe_iou([0.1, 0.1, 0.2, 0.2],
                     [0.1, 0.1, 0.2, 0.2]) == pytest.approx(1.0)


def test_identical_lists_with_degenerate_boxes():
    from megadetector_tpu.utils.md_tests import compare_detection_lists
    dets = [
        {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2]},
        {'category': '1', 'conf': 0.5, 'bbox': [0.99, 0.5, 0.0, 0.01]},
    ]
    r = compare_detection_lists(dets, dets)
    assert r['errors'] == []
    assert len(r['matched']) == 2


@pytest.mark.slow
def test_integration_harness_full_with_cli():
    """The full integration harness including the subprocess CLI tier
    (reference md_tests run_python_tests + run_cli_tests)."""

    from megadetector_tpu.utils.integration_tests import (
        MDTestOptions, run_tests)

    options = MDTestOptions()
    options.skip_cli_tests = False
    options.verbose = False
    status = run_tests(options)
    assert status['cli'] == 'ok'
    assert status['single_image'] == 'ok'
