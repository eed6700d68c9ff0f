"""
Stored-golden regression for the AOT .mdpkg artifact (VERDICT-r4 item 7).

Unlike the other golden tiers (which rebuild their model each run), this
tier commits the ARTIFACT BYTES: tests/data/stub_golden_model.mdpkg is a
serialized-StableHLO deployment artifact built once (from a pico-width
yolov5 so the committed file stays small), and every round must still
(a) deserialize it through load_detector with its integrity checks and
(b) produce the committed detections — catching artifact-format,
manifest, and lowering regressions without hardware, the offline analog
of the reference's exact-identity artifact contract
(/root/reference/megadetector/utils/md_tests.py:363-415).

Comparison uses the tolerant best-IoU matcher (same rationale as
test_int8_golden): across toolchain updates the deserialized StableHLO
is recompiled, and random-weight near-ties can legitimately flip; the
format/load path being tested is binary — it loads or it doesn't.

Regenerate intentionally (new artifact + new golden) with:
    MD_REGEN_GOLDENS=1 python -m pytest tests/test_mdpkg_golden.py
"""

import json
import os

import pytest

from megadetector_tpu.models import yolov5
from megadetector_tpu.utils import ct_utils

from test_reference_golden import _structured_images

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'data')
ARTIFACT_FILE = os.path.join(DATA_DIR, 'stub_golden_model.mdpkg')
GOLDEN_FILE = os.path.join(DATA_DIR, 'stub_golden_results_mdpkg.json')

IMAGE_SIZE = 128
SIZES = [(128, 128), (96, 160), (150, 100)]

CONF_TOL = 0.01
COORD_TOL = 0.005
IOU_MATCH = 0.6
FLOOR = 0.2
MATCH_FRACTION = 0.9


def _register_pico_variant():
    """A 1/8-width yolov5 ('yolov5p') so the committed artifact stays
    small (~0.5 MB); only needed when REGENERATING the artifact — the
    artifact itself is config-free (programs carry baked weights)."""

    yolov5.VARIANT_MULTIPLES.setdefault('p', (0.33, 0.125))


def _build_artifact(tmp_path):
    from megadetector_tpu.detection.export_detector import export_detector
    from megadetector_tpu.models.convert_weights import save_checkpoint

    _register_pico_variant()
    cfg = yolov5.YoloV5Config('yolov5p', num_classes=3)
    ckpt = str(tmp_path / 'pico.npz')
    save_checkpoint(yolov5.init_params(cfg, seed=3), ckpt, {
        'arch': 'yolov5p', 'model_type': 'yolov5', 'num_classes': 3,
        'model_version_string': 'v5a.0.1',
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': IMAGE_SIZE, 'anchors': cfg.anchors.tolist()})
    os.makedirs(DATA_DIR, exist_ok=True)
    export_detector(ckpt, ARTIFACT_FILE, batch_sizes=[1], aspects=[],
                    platforms=['cpu'])


def _run_pipeline(detector):
    results = []
    for i, img in enumerate(_structured_images(SIZES)):
        r = detector.generate_detections_one_image(
            img, image_id='mdpkg_{:02d}.jpg'.format(i),
            detection_threshold=0.005)
        results.append(r)
    return {'images': results}


def _tolerant_match(expected, got):
    """Best-IoU matching at the documented tolerances; returns
    (n_expected_above_floor, n_matched)."""

    exp = [d for d in expected if d['conf'] >= FLOOR]
    cand = [d for d in got if d['conf'] >= FLOOR - CONF_TOL]
    matched = 0
    used = set()
    for d in exp:
        best_j, best_iou = None, -1.0
        for j, e in enumerate(cand):
            if j in used or e['category'] != d['category']:
                continue
            if abs(e['conf'] - d['conf']) > CONF_TOL:
                continue
            if not all(abs(a - b) <= COORD_TOL
                       for a, b in zip(d['bbox'], e['bbox'])):
                continue
            if min(d['bbox'][2], d['bbox'][3],
                   e['bbox'][2], e['bbox'][3]) <= 0:
                iou = 1.0
            else:
                iou = ct_utils.get_iou(d['bbox'], e['bbox'])
            if iou >= IOU_MATCH and iou > best_iou:
                best_j, best_iou = j, iou
        if best_j is not None:
            matched += 1
            used.add(best_j)
    return len(exp), matched


def test_committed_artifact_matches_stored_golden(tmp_path):
    from megadetector_tpu.detection.export_detector import \
        ExportedDetector
    from megadetector_tpu.detection.run_detector import load_detector

    if os.environ.get('MD_REGEN_GOLDENS'):
        _build_artifact(tmp_path)

    assert os.path.isfile(ARTIFACT_FILE), \
        'Committed artifact missing; regenerate with MD_REGEN_GOLDENS=1'

    detector = load_detector(ARTIFACT_FILE)
    assert isinstance(detector, ExportedDetector)
    got = _run_pipeline(detector)

    if os.environ.get('MD_REGEN_GOLDENS'):
        with open(GOLDEN_FILE, 'w') as f:
            json.dump(got, f, indent=1)
        pytest.skip('mdpkg artifact + golden regenerated')

    assert os.path.isfile(GOLDEN_FILE), \
        'Golden file missing; regenerate with MD_REGEN_GOLDENS=1'
    with open(GOLDEN_FILE) as f:
        expected = json.load(f)

    assert len(got['images']) == len(expected['images'])
    total_exp = total_matched = 0
    for got_im, exp_im in zip(got['images'], expected['images']):
        assert got_im['file'] == exp_im['file']
        n_exp, n_matched = _tolerant_match(exp_im['detections'],
                                           got_im['detections'])
        total_exp += n_exp
        total_matched += n_matched
    assert total_exp >= 5, \
        'golden has too few above-floor detections ({})'.format(total_exp)
    assert total_matched >= MATCH_FRACTION * total_exp, \
        'artifact drift: only {}/{} matched'.format(total_matched,
                                                    total_exp)


def test_artifact_and_golden_are_committed():
    if os.environ.get('MD_REGEN_GOLDENS'):
        pytest.skip('regenerating')
    assert os.path.isfile(ARTIFACT_FILE)
    assert os.path.isfile(GOLDEN_FILE)
    # Size guard: the pico artifact must stay a reasonable test asset
    assert os.path.getsize(ARTIFACT_FILE) < 4 * 1024 * 1024
