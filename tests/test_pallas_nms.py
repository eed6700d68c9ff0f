"""Pallas NMS kernel vs the XLA reference implementation (interpret mode
on CPU)."""

import numpy as np
import pytest

import jax

from megadetector_tpu.ops.nms import _greedy_suppress, _pairwise_iou_xyxy
from megadetector_tpu.ops.pallas_nms import pallas_greedy_nms


def _reference_keep(boxes, valid, thresh):
    iou = _pairwise_iou_xyxy(boxes)
    return np.asarray(_greedy_suppress(iou, valid, thresh))


def _random_sorted_boxes(rng, k):
    xy = rng.uniform(0, 1000, (k, 2)).astype(np.float32)
    wh = rng.uniform(20, 200, (k, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=1)
    return boxes


def test_pallas_nms_matches_reference():
    rng = np.random.RandomState(0)
    k = 128
    boxes = _random_sorted_boxes(rng, k)
    valid = np.ones(k, bool)
    valid[100:] = False

    expected = _reference_keep(boxes, valid, 0.5)
    got = np.asarray(pallas_greedy_nms(
        boxes[None], valid[None], 0.5, interpret=True))[0]
    np.testing.assert_array_equal(got, expected)


def test_pallas_nms_batched():
    rng = np.random.RandomState(1)
    k = 64
    boxes = np.stack([_random_sorted_boxes(rng, k) for _ in range(3)])
    valid = np.ones((3, k), bool)

    got = np.asarray(pallas_greedy_nms(boxes, valid, 0.45,
                                       interpret=True))
    for b in range(3):
        expected = _reference_keep(boxes[b], valid[b], 0.45)
        np.testing.assert_array_equal(got[b], expected)


def test_pallas_nms_chain():
    # A > B overlap, B > C overlap, A-C don't: keep A and C
    boxes = np.array([
        [100, 100, 140, 140],
        [120, 100, 160, 140],
        [140, 100, 180, 140],
        [500, 500, 540, 540],
    ], dtype=np.float32)
    valid = np.ones(4, bool)
    got = np.asarray(pallas_greedy_nms(boxes[None], valid[None], 0.2,
                                       interpret=True))[0]
    np.testing.assert_array_equal(got, [True, False, True, True])
