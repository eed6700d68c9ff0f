"""
Legacy TF1 frozen-graph detector test: build a tiny synthetic graph with
the MegaDetector tensor names, freeze it, and run the TFDetector on it.
"""

import os

import numpy as np
import pytest

tf_module = pytest.importorskip('tensorflow')


@pytest.fixture(scope='module')
def synthetic_pb(tmp_path_factory):
    """A frozen graph emitting one fixed detection per image."""

    import tensorflow.compat.v1 as tf
    tf.disable_v2_behavior()

    graph = tf.Graph()
    with graph.as_default():
        image_tensor = tf.placeholder(tf.uint8, [None, None, None, 3],
                                      name='image_tensor')
        batch = tf.shape(image_tensor)[0]
        # One detection: box [y1,x1,y2,x2] = [0.1, 0.2, 0.5, 0.6],
        # score 0.9, class 1; plus a low-score filler
        boxes = tf.tile(tf.constant(
            [[[0.1, 0.2, 0.5, 0.6], [0.0, 0.0, 0.1, 0.1]]],
            tf.float32), [batch, 1, 1])
        scores = tf.tile(tf.constant([[0.9, 0.01]], tf.float32),
                         [batch, 1])
        classes = tf.tile(tf.constant([[1.0, 2.0]], tf.float32),
                          [batch, 1])
        tf.identity(boxes, name='detection_boxes')
        tf.identity(scores, name='detection_scores')
        tf.identity(classes, name='detection_classes')

    folder = tmp_path_factory.mktemp('tfmodel')
    pb_path = str(folder / 'megadetector_v4_test.pb')
    with open(pb_path, 'wb') as f:
        f.write(graph.as_graph_def().SerializeToString())
    return pb_path


def test_tf_detector(synthetic_pb):
    from megadetector_tpu.detection.tf_detector import TFDetector

    detector = TFDetector(synthetic_pb)
    img = np.zeros((80, 100, 3), dtype=np.uint8)
    result = detector.generate_detections_one_image(
        img, 'x.jpg', detection_threshold=0.1)
    assert result['detections'] is not None
    assert len(result['detections']) == 1
    det = result['detections'][0]
    assert det['category'] == '1'
    # truncate_float on a float32 0.9 (0.8999999...) gives 0.899,
    # exactly as the reference's truncation would
    assert det['conf'] == pytest.approx(0.9, abs=2e-3)
    # [y1,x1,y2,x2]=[0.1,0.2,0.5,0.6] -> [x,y,w,h]=[0.2,0.1,0.4,0.4]
    assert det['bbox'] == pytest.approx([0.2, 0.1, 0.4, 0.4], abs=1e-3)

    batch = detector.generate_detections_one_batch(
        [img, img], ['a.jpg', 'b.jpg'], detection_threshold=0.1)
    assert len(batch) == 2
    assert batch[1]['file'] == 'b.jpg'
