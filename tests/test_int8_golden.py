"""
int8-chain stored golden on the flagship (P6 / stride-64) family.

Round-2 verdict item 5: the bf16/f32 paths have stored goldens but the
int8 activation-chain program was only nano-cross-checked against the
float path. This tier pins the full quantized pipeline — calibrated
chain scales -> int8 conv chains -> fused candidate selection -> NMS ->
MD emission — on a yolov5s6 (same 4-head stride-64 topology as the l6
flagship, CPU-test-sized) over rectangular auto canvases.

Comparison is IoU-matched at documented int8 tolerances (conf 0.02,
coord 0.01, IoU 0.6, floor 0.2) with a 90% match requirement rather
than the reference's exact 0.005/0.001: random-weight conv nets produce
near-tied overlapping candidates whose NMS winner can legitimately flip
under cross-toolchain int8 rounding drift; requiring 90% strict matches
pins the numerics without pinning tie-break outcomes. The
float-vs-int8 consistency test below runs same-toolchain and is exact
about its bound.

Regenerate intentionally with:
    MD_REGEN_GOLDENS=1 python -m pytest tests/test_int8_golden.py
"""

import json
import os

import numpy as np
import pytest

from megadetector_tpu.models import yolov5
from megadetector_tpu.models.convert_weights import (
    quantize_checkpoint, save_checkpoint)
from megadetector_tpu.models.detector import TPUDetector
from megadetector_tpu.utils import ct_utils

from test_reference_golden import _structured_images

GOLDEN_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'data', 'int8_s6_golden_results.json')

IMAGE_SIZE = 128
SIZES = [(128, 128), (96, 160), (165, 95)]

INT8_CONF_TOL = 0.02
INT8_COORD_TOL = 0.01
INT8_IOU_MATCH = 0.6
INT8_FLOOR = 0.2
INT8_MATCH_FRACTION = 0.9


@pytest.fixture(scope='module')
def checkpoints(tmp_path_factory):
    folder = tmp_path_factory.mktemp('int8_golden_model')
    cfg = yolov5.YoloV5Config('yolov5s6', num_classes=3)
    f_path = str(folder / 'float.npz')
    save_checkpoint(yolov5.init_params(cfg, seed=0), f_path, {
        'arch': 'yolov5s6', 'model_type': 'yolov5', 'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': IMAGE_SIZE, 'anchors': cfg.anchors.tolist()})
    q_path = str(folder / 'int8.npz')
    quantize_checkpoint(f_path, q_path,
                        calibration_image_size=IMAGE_SIZE, mode='chain')
    return f_path, q_path


def _run_pipeline(detector):
    results = []
    for i, img in enumerate(_structured_images(SIZES)):
        r = detector.generate_detections_one_image(
            img, image_id='int8_{:02d}.jpg'.format(i),
            detection_threshold=0.005)
        results.append(r)
    return {'images': results}


def _tolerant_match(expected, got):
    """
    IoU-matched comparison at int8 tolerances; returns (n_expected,
    n_matched) over detections above the floor.
    """

    exp = [d for d in expected if d['conf'] >= INT8_FLOOR]
    cand = [d for d in got if d['conf'] >= INT8_FLOOR - INT8_CONF_TOL]
    matched = 0
    used = set()
    for d in exp:
        # Best-IoU matching, not first-fit: random-weight models emit
        # walls of near-tied overlapping boxes, and first-fit pairing
        # can consume a candidate another expected box needed, under-
        # counting matches even when the two sets are nearly identical.
        best_j, best_iou = None, -1.0
        for j, e in enumerate(cand):
            if j in used or e['category'] != d['category']:
                continue
            if abs(e['conf'] - d['conf']) > INT8_CONF_TOL:
                continue
            if not all(abs(a - b) <= INT8_COORD_TOL
                       for a, b in zip(d['bbox'], e['bbox'])):
                continue
            # Degenerate (zero-area) boxes — candidates clipped to the
            # canvas edge, common with random weights — have no defined
            # IoU; the coord-tolerance check above is the whole match.
            if min(d['bbox'][2], d['bbox'][3],
                   e['bbox'][2], e['bbox'][3]) <= 0:
                iou = 1.0
            else:
                iou = ct_utils.get_iou(d['bbox'], e['bbox'])
            if iou >= INT8_IOU_MATCH and iou > best_iou:
                best_j, best_iou = j, iou
        if best_j is not None:
            matched += 1
            used.add(best_j)
    return len(exp), matched


def test_int8_chain_matches_stored_golden(checkpoints):
    _, q_path = checkpoints
    detector = TPUDetector(q_path)
    got = _run_pipeline(detector)

    # The run exercised the rect-canvas path (stride 64 on non-square
    # inputs) and the int8 chain really loaded int8 leaves
    import jax.numpy as jnp
    leaves = [l for l in
              __import__('jax').tree_util.tree_leaves(detector.params)
              if hasattr(l, 'dtype')]
    assert any(l.dtype == jnp.int8 for l in leaves), \
        'quantized checkpoint has no int8 leaves'

    if os.environ.get('MD_REGEN_GOLDENS'):
        os.makedirs(os.path.dirname(GOLDEN_FILE), exist_ok=True)
        with open(GOLDEN_FILE, 'w') as f:
            json.dump(got, f, indent=1)
        pytest.skip('int8 goldens regenerated at {}'.format(GOLDEN_FILE))

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
    assert total_exp >= 10, \
        'golden has too few above-floor detections ({})'.format(total_exp)
    assert total_matched >= INT8_MATCH_FRACTION * total_exp, \
        'int8 drift: only {}/{} matched'.format(total_matched, total_exp)


def test_int8_chain_close_to_float(checkpoints):
    """
    Same-toolchain float-vs-int8 raw-forward consistency on the
    stride-64 family, anchor-aligned (no NMS matching ambiguity —
    random weights produce hundreds of near-tied candidates whose
    post-NMS winners legitimately flip under quantization, so e2e
    detection matching is the wrong instrument; this extends the
    round-2 nano cross-check bounds to the flagship topology):
    p99 |delta obj*cls| < 0.02 and p99 |delta xy| < 2px.
    """

    import jax.numpy as jnp

    f_path, q_path = checkpoints
    det_f = TPUDetector(f_path)
    det_q = TPUDetector(q_path)

    img = _structured_images([(128, 128)])[0]
    x = jnp.asarray(img[None]).astype(jnp.float32) / 255.0

    pred_f = np.asarray(det_f._apply_fn(det_f.config, det_f.params, x,
                                        dtype=jnp.float32))
    pred_q = np.asarray(det_q._apply_fn(det_q.config, det_q.params, x,
                                        dtype=jnp.float32))
    assert pred_f.shape == pred_q.shape

    score_f = pred_f[..., 4:5] * pred_f[..., 5:]
    score_q = pred_q[..., 4:5] * pred_q[..., 5:]
    d_score = np.abs(score_f - score_q)
    d_xy = np.abs(pred_f[..., :2] - pred_q[..., :2])

    assert np.percentile(d_score, 99) < 0.02, \
        'int8 score drift p99 {:.4f}'.format(np.percentile(d_score, 99))
    assert np.percentile(d_xy, 99) < 2.0, \
        'int8 xy drift p99 {:.2f}px'.format(np.percentile(d_xy, 99))
