"""
The real-weight validation gate (utils/validate_weights.py): the
dry-run mode must prove every stage end-to-end on a synthetic
checkpoint, so the gate is known-good the day real weights arrive
(reference contract: megadetector/utils/md_tests.py:418-649).
"""

import json
import os

import numpy as np
import pytest

from megadetector_tpu.models import yolov5
from megadetector_tpu.models.convert_weights import save_checkpoint
from megadetector_tpu.utils.validate_weights import (
    ValidateWeightsOptions, _match_drift, validate_weights)


@pytest.fixture(scope='module')
def stub_checkpoint(tmp_path_factory):
    folder = tmp_path_factory.mktemp('validate_model')
    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    params = yolov5.init_params(cfg, seed=5)
    path = str(folder / 'stub.npz')
    save_checkpoint(params, path, {
        'model_version_string': 'v5a.0.1', 'arch': 'yolov5n',
        'model_type': 'yolov5', 'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': 160, 'anchors': cfg.anchors.tolist()})
    return path


@pytest.mark.slow
def test_gate_dry_run(stub_checkpoint, tmp_path):
    """Full gate on the stub checkpoint: all stages run and report."""

    options = ValidateWeightsOptions()
    options.checkpoint = stub_checkpoint
    options.scratch_dir = str(tmp_path / 'scratch')
    options.force_cpu = True
    # Random weights drift arbitrarily under int8; the dry run proves
    # the machinery, not the numerics
    options.int8_p99_score_drift = 1.0
    report = validate_weights(options)

    assert report['status'] == 'ok', report
    for stage in ('convert', 'golden', 'int8', 'capacity', 'export'):
        assert report[stage]['status'] == 'ok', (stage, report[stage])
    assert os.path.isfile(report['golden']['golden_file'])
    assert report['export']['tamper_rejected'] is True
    assert report['capacity']['max_candidates_at_floor'] >= 0
    # Random weights blow past 512 candidates at the floor; the scan
    # must recommend a ladder rather than claim sufficiency
    if not report['capacity']['topk_512_sufficient']:
        assert report['capacity']['recommended_topk_ladder'][0] == 512


def test_gate_fast_stages(stub_checkpoint, tmp_path):
    """Gate with the slow stages skipped: convert+golden+capacity only
    (the always-on CI tier)."""

    options = ValidateWeightsOptions()
    options.checkpoint = stub_checkpoint
    options.scratch_dir = str(tmp_path / 'scratch')
    options.force_cpu = True
    options.skip_int8 = True
    options.skip_export = True
    report = validate_weights(options)
    assert report['status'] == 'ok', report
    assert report['int8']['status'] == 'skipped'
    assert report['export']['status'] == 'skipped'
    with open(report['golden']['golden_file']) as f:
        golden = json.load(f)
    assert golden['info']['format_version'] == '1.6'
    assert len(golden['images']) == 6


def test_golden_comparison_catches_drift(stub_checkpoint, tmp_path):
    """A doctored expected-results file must fail the golden stage."""

    options = ValidateWeightsOptions()
    options.checkpoint = stub_checkpoint
    options.scratch_dir = str(tmp_path / 'scratch')
    options.force_cpu = True
    options.skip_int8 = True
    options.skip_export = True
    report = validate_weights(options)
    golden_file = report['golden']['golden_file']

    with open(golden_file) as f:
        doctored = json.load(f)
    moved = 0
    for im in doctored['images']:
        for d in im.get('detections') or []:
            d['conf'] = min(1.0, d['conf'] + 0.3)
            moved += 1
    assert moved > 0
    expected = str(tmp_path / 'expected_doctored.json')
    with open(expected, 'w') as f:
        json.dump(doctored, f)

    options2 = ValidateWeightsOptions()
    options2.checkpoint = stub_checkpoint
    options2.scratch_dir = str(tmp_path / 'scratch2')
    options2.force_cpu = True
    options2.skip_int8 = True
    options2.skip_export = True
    options2.expected_results_file = expected
    report2 = validate_weights(options2)
    assert report2['status'] == 'FAILED'
    assert 'golden' in report2['failed_stages']


def test_match_drift_alignment():
    """The drift matcher pairs by best IoU within category and reports
    unmatched float detections."""

    float_ims = [{'file': 'a.jpg', 'detections': [
        {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2]},
        {'category': '2', 'conf': 0.8, 'bbox': [0.5, 0.5, 0.2, 0.2]},
    ]}]
    int8_ims = [{'file': 'a.jpg', 'detections': [
        {'category': '1', 'conf': 0.88, 'bbox': [0.105, 0.1, 0.2, 0.2]},
    ]}]
    scores, coords, unmatched = _match_drift(float_ims, int8_ims)
    assert unmatched == 1
    assert len(scores) == 1
    assert abs(scores[0] - 0.02) < 1e-9
    assert max(coords) == pytest.approx(0.005)
