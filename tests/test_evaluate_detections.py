"""
COCO-style mAP harness (postprocessing/evaluate_detections.py):
synthetic GT with known-perfect, known-miss, and localization-drift
cases pin the AP math before real weights arrive.
"""

import pytest

from megadetector_tpu.postprocessing.evaluate_detections import (
    COCO_IOU_THRESHOLDS, _average_precision, evaluate_detections)


def _gt(files_boxes):
    """files_boxes: {fn: [(category_id, [x_px, y_px, w_px, h_px])]} on
    100x100 images."""

    images = [{'id': fn, 'file_name': fn, 'width': 100, 'height': 100}
              for fn in files_boxes]
    annotations = []
    for fn, boxes in files_boxes.items():
        for cat, box in boxes:
            annotations.append({'id': len(annotations), 'image_id': fn,
                                'category_id': cat, 'bbox': box})
    return {'images': images, 'annotations': annotations,
            'categories': [{'id': 1, 'name': 'animal'},
                           {'id': 2, 'name': 'person'}]}


def _md(images):
    return {'images': images,
            'detection_categories': {'1': 'animal', '2': 'person'},
            'info': {'format_version': '1.6'}}


def test_perfect_detections_ap_one():
    gt = _gt({'a.jpg': [(1, [10, 10, 20, 20])],
              'b.jpg': [(1, [30, 30, 40, 40])]})
    md = _md([
        {'file': 'a.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2]}]},
        {'file': 'b.jpg', 'detections': [
            {'category': '1', 'conf': 0.8, 'bbox': [0.3, 0.3, 0.4, 0.4]}]},
    ])
    m = evaluate_detections(md, gt)
    assert m['mAP'] == pytest.approx(1.0)
    assert m['per_iou'][0.5]['per_class']['animal']['ap'] == \
        pytest.approx(1.0)
    assert m['n_images_evaluated'] == 2


def test_false_positive_halves_precision():
    gt = _gt({'a.jpg': [(1, [10, 10, 20, 20])],
              'b.jpg': []})
    md = _md([
        {'file': 'a.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2]}]},
        # High-confidence FP ranked first
        {'file': 'b.jpg', 'detections': [
            {'category': '1', 'conf': 0.95, 'bbox': [0.5, 0.5, 0.2, 0.2]}]},
    ])
    m = evaluate_detections(md, gt)
    # One GT; the TP arrives second: AP = precision at recall 1 = 1/2
    assert m['mAP'] == pytest.approx(0.5)


def test_miss_caps_recall():
    gt = _gt({'a.jpg': [(1, [10, 10, 20, 20]),
                        (1, [60, 60, 20, 20])]})
    md = _md([
        {'file': 'a.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2]}]},
    ])
    m = evaluate_detections(md, gt)
    assert m['mAP'] == pytest.approx(0.5)  # 1 of 2 GT found, no FPs


def test_localization_drift_fails_high_iou():
    """A slightly-shifted box passes IoU 0.5 but fails 0.95, so the
    COCO ladder lands strictly between 0 and 1."""

    gt = _gt({'a.jpg': [(1, [10, 10, 20, 20])]})
    md = _md([
        {'file': 'a.jpg', 'detections': [
            {'category': '1', 'conf': 0.9,
             'bbox': [0.12, 0.1, 0.2, 0.2]}]},
    ])
    m = evaluate_detections(md, gt, iou_thresholds=COCO_IOU_THRESHOLDS)
    assert m['per_iou'][0.5]['mAP'] == pytest.approx(1.0)
    assert m['per_iou'][0.95]['mAP'] == pytest.approx(0.0)
    assert 0.0 < m['mAP'] < 1.0


def test_category_faithful():
    """A detection of the wrong class never matches GT of another."""

    gt = _gt({'a.jpg': [(1, [10, 10, 20, 20])]})
    md = _md([
        {'file': 'a.jpg', 'detections': [
            {'category': '2', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2]}]},
    ])
    m = evaluate_detections(md, gt)
    assert m['per_iou'][0.5]['per_class']['animal']['ap'] == 0.0
    # person has no GT: AP undefined, excluded from the mean
    assert m['per_iou'][0.5]['per_class']['person']['ap'] is None
    assert m['mAP'] == pytest.approx(0.0)


def test_one_gt_matches_once():
    """Duplicate detections on one GT: second is a FP (COCO greedy)."""

    gt = _gt({'a.jpg': [(1, [10, 10, 20, 20])]})
    md = _md([
        {'file': 'a.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2]},
            {'category': '1', 'conf': 0.8,
             'bbox': [0.11, 0.1, 0.2, 0.2]}]},
    ])
    m = evaluate_detections(md, gt)
    per = m['per_iou'][0.5]['per_class']['animal']
    assert per['n_detections'] == 2
    assert per['ap'] == pytest.approx(1.0)  # TP first; dup FP after recall 1


def test_failed_and_unknown_images_excluded():
    gt = _gt({'a.jpg': [(1, [10, 10, 20, 20])]})
    md = _md([
        {'file': 'a.jpg', 'detections': [
            {'category': '1', 'conf': 0.9, 'bbox': [0.1, 0.1, 0.2, 0.2]}]},
        {'file': 'failed.jpg', 'detections': None,
         'failure': 'image access failure'},
        {'file': 'not_in_gt.jpg', 'detections': []},
    ])
    m = evaluate_detections(md, gt)
    assert m['n_images_evaluated'] == 1
    assert m['mAP'] == pytest.approx(1.0)


def test_average_precision_math():
    # 3 GT; detections ranked [TP, FP, TP]: PR points (1, 1/3),
    # (0.5, 1/3->...), interpolated AP = 1/3*1 + 1/3*2/3 = 0.5556
    ap = _average_precision([0.9, 0.8, 0.7], [1, 0, 1], 3)
    assert ap == pytest.approx(1 / 3 + (1 / 3) * (2 / 3), abs=1e-6)
    assert _average_precision([], [], 0) is None
    assert _average_precision([], [], 2) == 0.0
