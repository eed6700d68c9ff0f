"""Native C++ kernel tests (skipped when no compiler is available)."""

import numpy as np
import pytest

from megadetector_tpu import native

pytestmark = pytest.mark.skipif(not native.is_available(),
                                reason='native library unavailable')


def test_native_letterbox_matches_host():
    from megadetector_tpu.ops import boxes as box_ops
    rng = np.random.RandomState(0)
    for (h, w) in [(480, 640), (100, 50), (128, 128)]:
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        ref, _, _ = box_ops.letterbox(img, (128, 128), auto=False,
                                      scaleup=True)
        out = native.letterbox_u8(img, 128)
        assert out.shape == ref.shape
        diff = np.abs(out.astype(np.int16) - ref.astype(np.int16))
        # cv2 fixed-point vs our float bilinear: tiny per-pixel deviation
        assert np.mean(diff) < 1.0
        assert np.percentile(diff, 99) <= 4


def test_native_nms():
    boxes = np.array([
        [0, 0, 100, 100],
        [5, 5, 105, 105],
        [300, 300, 400, 400],
    ], dtype=np.float32)
    scores = np.array([0.9, 0.8, 0.7], dtype=np.float32)
    keep = native.nms_xyxy(boxes, scores, 0.45)
    assert keep.tolist() == [0, 2]


def test_native_nms_matches_python():
    rng = np.random.RandomState(1)
    n = 200
    xy = rng.uniform(0, 900, (n, 2)).astype(np.float32)
    wh = rng.uniform(20, 120, (n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=1)
    scores = rng.uniform(0, 1, n).astype(np.float32)

    keep = set(native.nms_xyxy(boxes, scores, 0.5).tolist())

    # Python oracle
    order = np.argsort(-scores)
    suppressed = np.zeros(n, bool)
    expected = []
    for i in order:
        if suppressed[i]:
            continue
        expected.append(i)
        ix0 = np.maximum(boxes[:, 0], boxes[i, 0])
        iy0 = np.maximum(boxes[:, 1], boxes[i, 1])
        ix1 = np.minimum(boxes[:, 2], boxes[i, 2])
        iy1 = np.minimum(boxes[:, 3], boxes[i, 3])
        inter = np.maximum(ix1 - ix0, 0) * np.maximum(iy1 - iy0, 0)
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / np.maximum(areas + areas[i] - inter, 1e-9)
        suppressed |= iou > 0.5
        suppressed[i] = True
    assert keep == set(int(i) for i in expected)


def test_native_cluster_boxes():
    boxes = np.array([
        [0.40, 0.40, 0.10, 0.10],
        [0.401, 0.401, 0.10, 0.10],   # same cluster
        [0.80, 0.80, 0.05, 0.05],     # different cluster
        [0.40, 0.40, 0.10, 0.10],     # back to the first cluster
    ], dtype=np.float32)
    cats = np.array([1, 1, 1, 1], dtype=np.int32)
    cluster_ids, n_clusters = native.cluster_boxes(boxes, cats, 0.9)
    assert n_clusters == 2
    assert cluster_ids[0] == cluster_ids[1] == cluster_ids[3]
    assert cluster_ids[2] != cluster_ids[0]

    # Category-aware clustering splits by category
    cats2 = np.array([1, 2, 1, 1], dtype=np.int32)
    cluster_ids, n_clusters = native.cluster_boxes(boxes, cats2, 0.9)
    assert n_clusters == 3
