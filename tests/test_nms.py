"""
Synthetic NMS tests: build raw YOLO prediction tensors with known
suppression outcomes and verify the on-device fixed-shape NMS against a
straightforward numpy oracle implementing the reference semantics
(objectness filter, obj*cls scoring, best-class-only, per-class greedy
suppression, max_det cap). Mirrors the reference's synthetic NMS test
strategy (reference: tests/test_nms_synthetic.py).
"""

import numpy as np
import pytest

from megadetector_tpu.ops.nms import batched_nms, nms_xyxy


def _iou_xyxy(a, b):
    ix0 = max(a[0], b[0])
    iy0 = max(a[1], b[1])
    ix1 = min(a[2], b[2])
    iy1 = min(a[3], b[3])
    inter = max(ix1 - ix0, 0) * max(iy1 - iy0, 0)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / max(area_a + area_b - inter, 1e-9)


def reference_nms(pred, conf_thres, iou_thres, max_det=300):
    """Numpy oracle with the reference's NMS semantics."""

    out = []
    for img in pred:
        obj = img[:, 4]
        keep_rows = img[obj > conf_thres]
        if keep_rows.shape[0] == 0:
            out.append(np.zeros((0, 6)))
            continue
        cls_conf = keep_rows[:, 5:] * keep_rows[:, 4:5]
        best_conf = cls_conf.max(axis=1)
        best_idx = cls_conf.argmax(axis=1)
        mask = best_conf > conf_thres
        rows = keep_rows[mask]
        best_conf = best_conf[mask]
        best_idx = best_idx[mask]
        if rows.shape[0] == 0:
            out.append(np.zeros((0, 6)))
            continue
        boxes = np.stack([
            rows[:, 0] - rows[:, 2] / 2, rows[:, 1] - rows[:, 3] / 2,
            rows[:, 0] + rows[:, 2] / 2, rows[:, 1] + rows[:, 3] / 2], axis=1)
        final = []
        for c in np.unique(best_idx):
            sel = best_idx == c
            c_boxes = boxes[sel]
            c_scores = best_conf[sel]
            order = np.argsort(-c_scores)
            kept = []
            for i in order:
                if all(_iou_xyxy(c_boxes[i], c_boxes[j]) <= iou_thres
                       for j in kept):
                    kept.append(i)
            for i in kept:
                final.append(list(c_boxes[i]) + [c_scores[i], float(c)])
        final = np.array(sorted(final, key=lambda r: -r[4]))
        out.append(final[:max_det])
    return out


def make_pred(dets, num_anchors=64, num_classes=3):
    """
    Build a [1, num_anchors, 5+nc] tensor from a list of
    (cx, cy, w, h, obj, class_idx, cls_conf) tuples; remaining anchors get
    zero objectness.
    """

    pred = np.zeros((1, num_anchors, 5 + num_classes), dtype=np.float32)
    for i, (cx, cy, w, h, obj, ci, cc) in enumerate(dets):
        pred[0, i, :4] = (cx, cy, w, h)
        pred[0, i, 4] = obj
        pred[0, i, 5 + ci] = cc
    return pred


def assert_matches_oracle(pred, conf_thres=0.1, iou_thres=0.45, max_det=300):
    expected = reference_nms(pred, conf_thres, iou_thres, max_det)
    got = batched_nms(pred, conf_thres, iou_thres, max_det=max_det,
                      pre_nms_topk=min(64, pred.shape[1]))
    for b in range(pred.shape[0]):
        valid = np.asarray(got['valid'][b])
        boxes = np.asarray(got['boxes'][b])[valid]
        scores = np.asarray(got['scores'][b])[valid]
        classes = np.asarray(got['classes'][b])[valid]
        exp = expected[b]
        assert boxes.shape[0] == exp.shape[0], \
            'Count mismatch: got {} expected {}'.format(
                boxes.shape[0], exp.shape[0])
        # Tie order is not guaranteed, so match rows by (box, class)
        for row in exp:
            dists = np.abs(boxes - row[:4]).sum(axis=1) + \
                1e6 * (classes != int(row[5]))
            i = int(np.argmin(dists))
            assert dists[i] < 1e-3, 'No matching box for {}'.format(row)
            assert scores[i] == pytest.approx(row[4], abs=1e-5)
            assert classes[i] == int(row[5])


def test_single_detection():
    pred = make_pred([(100, 100, 50, 50, 0.9, 0, 0.8)])
    assert_matches_oracle(pred)


def test_all_below_threshold():
    pred = make_pred([(100, 100, 50, 50, 0.05, 0, 0.9)])
    got = batched_nms(pred, 0.1, 0.45, pre_nms_topk=64)
    assert not bool(np.asarray(got['valid']).any())


def test_objectness_gates_score():
    # High class conf but objectness below threshold -> dropped
    pred = make_pred([(100, 100, 50, 50, 0.08, 1, 0.99)])
    got = batched_nms(pred, 0.1, 0.45, pre_nms_topk=64)
    assert not bool(np.asarray(got['valid']).any())


def test_score_is_obj_times_cls():
    pred = make_pred([(100, 100, 50, 50, 0.5, 2, 0.6)])
    got = batched_nms(pred, 0.1, 0.45, pre_nms_topk=64)
    valid = np.asarray(got['valid'][0])
    assert valid.sum() == 1
    assert np.asarray(got['scores'][0])[valid][0] == pytest.approx(0.3,
                                                                   abs=1e-6)
    assert np.asarray(got['classes'][0])[valid][0] == 2


def test_overlapping_same_class_suppressed():
    # Two heavily-overlapping boxes, same class: keep the higher score
    pred = make_pred([
        (100, 100, 50, 50, 0.9, 0, 0.9),
        (102, 102, 50, 50, 0.8, 0, 0.9),
    ])
    assert_matches_oracle(pred)
    got = batched_nms(pred, 0.1, 0.45, pre_nms_topk=64)
    assert int(np.asarray(got['valid'][0]).sum()) == 1


def test_overlapping_different_class_kept():
    # Identical boxes, different classes: per-class NMS keeps both
    pred = make_pred([
        (100, 100, 50, 50, 0.9, 0, 0.9),
        (100, 100, 50, 50, 0.8, 1, 0.9),
    ])
    assert_matches_oracle(pred)
    got = batched_nms(pred, 0.1, 0.45, pre_nms_topk=64)
    assert int(np.asarray(got['valid'][0]).sum()) == 2


def test_class_agnostic_mode():
    pred = make_pred([
        (100, 100, 50, 50, 0.9, 0, 0.9),
        (100, 100, 50, 50, 0.8, 1, 0.9),
    ])
    got = batched_nms(pred, 0.1, 0.45, pre_nms_topk=64, class_agnostic=True)
    assert int(np.asarray(got['valid'][0]).sum()) == 1


def test_chain_suppression():
    # A>B overlap, B>C overlap, A-C don't: greedy keeps A and C
    pred = make_pred([
        (100, 100, 40, 40, 0.9, 0, 0.9),   # A
        (120, 100, 40, 40, 0.8, 0, 0.9),   # B overlaps A and C
        (140, 100, 40, 40, 0.7, 0, 0.9),   # C
    ])
    assert_matches_oracle(pred, iou_thres=0.3)


def test_disjoint_detections_all_kept():
    dets = [(100 + 200 * i, 100, 50, 50, 0.9 - 0.05 * i, i % 3, 0.9)
            for i in range(5)]
    pred = make_pred(dets)
    assert_matches_oracle(pred)


def test_max_det_cap():
    dets = [(100 + 60 * i, 100 + 60 * (i % 7), 30, 30, 0.5, 0, 0.9)
            for i in range(20)]
    pred = make_pred(dets, num_anchors=64)
    got = batched_nms(pred, 0.1, 0.45, max_det=8, pre_nms_topk=64)
    assert int(np.asarray(got['valid'][0]).sum()) == 8
    # Highest scores kept, descending order
    scores = np.asarray(got['scores'][0])[:8]
    assert all(scores[i] >= scores[i + 1] for i in range(7))


def test_batched_images_independent():
    pred1 = make_pred([(100, 100, 50, 50, 0.9, 0, 0.9)])
    pred2 = make_pred([(300, 300, 60, 60, 0.8, 1, 0.7),
                       (500, 500, 60, 60, 0.7, 2, 0.7)])
    pred = np.concatenate([pred1, pred2], axis=0)
    got = batched_nms(pred, 0.1, 0.45, pre_nms_topk=64)
    assert int(np.asarray(got['valid'][0]).sum()) == 1
    assert int(np.asarray(got['valid'][1]).sum()) == 2


def test_random_fuzz_vs_oracle():
    rng = np.random.RandomState(0)
    for trial in range(5):
        n = 48
        cx = rng.uniform(50, 1200, n)
        cy = rng.uniform(50, 1200, n)
        w = rng.uniform(20, 200, n)
        h = rng.uniform(20, 200, n)
        obj = rng.uniform(0, 1, n)
        cls = np.zeros((n, 3))
        cls[np.arange(n), rng.randint(0, 3, n)] = rng.uniform(0.3, 1, n)
        pred = np.concatenate(
            [np.stack([cx, cy, w, h, obj], axis=1), cls],
            axis=1)[None].astype(np.float32)
        assert_matches_oracle(pred, conf_thres=0.25, iou_thres=0.45)


def test_nms_xyxy_plain():
    boxes = np.array([
        [0, 0, 100, 100],
        [5, 5, 105, 105],    # overlaps the first
        [300, 300, 400, 400],
    ], dtype=np.float32)
    scores = np.array([0.9, 0.8, 0.7], dtype=np.float32)
    keep, valid = nms_xyxy(boxes, scores, iou_thres=0.45)
    kept = np.asarray(keep)[np.asarray(valid)]
    assert set(kept.tolist()) == {0, 2}


def test_fixpoint_suppress_matches_loop_random():
    """The fixpoint-iteration suppressor (ops/nms._fixpoint_suppress) must
    produce exactly the greedy keep mask on randomized candidate sets,
    including long suppression chains."""

    from megadetector_tpu.ops.nms import (
        _fixpoint_suppress, _greedy_suppress, _pairwise_iou_xyxy)
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    for trial in range(20):
        n = 96
        # Cluster boxes so chains of overlapping candidates are common
        centers = rng.uniform(0, 200, (n, 2)) if trial % 2 == 0 else \
            rng.uniform(0, 60, (n, 2))
        wh = rng.uniform(20, 80, (n, 2))
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2], axis=1)
        valid = rng.uniform(size=n) > 0.2
        iou = _pairwise_iou_xyxy(jnp.asarray(boxes, jnp.float32))
        ref = np.asarray(_greedy_suppress(iou, jnp.asarray(valid), 0.3))
        got = np.asarray(_fixpoint_suppress(iou, jnp.asarray(valid), 0.3))
        np.testing.assert_array_equal(got, ref,
                                      err_msg='trial {}'.format(trial))


def test_fixpoint_suppress_adversarial_chain():
    """A strict suppression chain (each box suppresses the next) is the
    worst case for fixpoint convergence: greedy keeps alternating boxes."""

    from megadetector_tpu.ops.nms import (
        _fixpoint_suppress, _pairwise_iou_xyxy)
    import jax.numpy as jnp

    n = 32
    # Overlapping ladder: box i spans [i*10, i*10+25] so IoU(i, i+1) ~ 0.43
    boxes = np.stack([np.arange(n) * 10.0,
                      np.zeros(n),
                      np.arange(n) * 10.0 + 25.0,
                      np.full(n, 10.0)], axis=1)
    iou = _pairwise_iou_xyxy(jnp.asarray(boxes, jnp.float32))
    keep = np.asarray(_fixpoint_suppress(
        iou, jnp.ones(n, bool), 0.3))
    # Greedy over a chain keeps every other box
    np.testing.assert_array_equal(keep, np.arange(n) % 2 == 0)


def test_batched_nms_fixpoint_mode_matches_oracle():
    pred = make_pred([
        (100, 100, 50, 50, 0.9, 0, 0.8),
        (105, 102, 50, 50, 0.85, 0, 0.9),
        (300, 300, 40, 40, 0.7, 1, 0.95),
        (302, 301, 42, 38, 0.6, 1, 0.9),
        (100, 100, 50, 50, 0.8, 2, 0.9),
    ])
    expected = reference_nms(pred, 0.1, 0.45, 300)
    got = batched_nms(pred, 0.1, 0.45, max_det=300, pre_nms_topk=64,
                      suppress_mode='fixpoint')
    valid = np.asarray(got['valid'][0])
    assert valid.sum() == expected[0].shape[0]
