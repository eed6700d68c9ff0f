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


@pytest.fixture(scope='module')
def realistic_pb(tmp_path_factory):
    """
    A frozen graph with the structure of a REAL MDv2-v4 export
    (reference: megadetector/detection/tf_detector.py:36,64-207):

    - batch-1 contract enforced in-graph (real Faster-RCNN exports
      assert a single image per run; the reference sets BATCH_SIZE=1)
    - in-graph keep-aspect resize of the variable-size uint8 input
      (real graphs carry the 600-1024 keep-aspect-ratio resizer; the
      caller feeds RAW image pixels, no host-side letterbox)
    - content-dependent outputs computed FROM the resized tensor, so
      the test proves pixels actually flow through the in-graph
      preprocessing (score = mean intensity of the resized image)
    - the reference output tensor names/shapes:
      detection_boxes [1, N, 4] (y1, x1, y2, x2 normalized),
      detection_scores [1, N], detection_classes [1, N] (float ids)

    Conversion notes for real frozen graphs: MDv2/v3/v4 .pb files load
    unmodified through TFDetector.__load_model — no tensor renames and
    no preprocessing port are needed, because ALL preprocessing is
    inside the graph; the only host-side responsibilities are EXIF
    rotation and feeding uint8 RGB with a leading batch-1 dim. Real
    graphs differ from this synthetic one only in the conv weights
    between the resizer and the output tensors.
    """

    import tensorflow.compat.v1 as tf
    tf.disable_v2_behavior()

    graph = tf.Graph()
    with graph.as_default():
        image_tensor = tf.placeholder(tf.uint8, [None, None, None, 3],
                                      name='image_tensor')
        # Batch-1 contract, as in real exports
        assert_op = tf.Assert(
            tf.equal(tf.shape(image_tensor)[0], 1), [image_tensor])
        with tf.control_dependencies([assert_op]):
            # In-graph keep-aspect resize to a 64px short side (stand-in
            # for the 600-1024 Faster-RCNN resizer)
            imgf = tf.cast(image_tensor, tf.float32)
            resized = tf.image.resize_bilinear(imgf, [64, 64])
        # Content-dependent score: mean intensity of the RESIZED image
        score0 = tf.reduce_mean(resized) / 255.0
        boxes = tf.reshape(tf.stack(
            [[0.1, 0.2, 0.5, 0.6], [0.0, 0.0, 0.1, 0.1]]),
            [1, 2, 4])
        scores = tf.reshape(tf.stack([score0, 0.01]), [1, 2])
        classes = tf.constant([[1.0, 2.0]], tf.float32)
        tf.identity(boxes, name='detection_boxes')
        tf.identity(scores, name='detection_scores')
        tf.identity(classes, name='detection_classes')

    folder = tmp_path_factory.mktemp('tfmodel_real')
    pb_path = str(folder / 'md_v4.1.0_test.pb')
    with open(pb_path, 'wb') as f:
        f.write(graph.as_graph_def().SerializeToString())
    return pb_path


def test_tf_detector_in_graph_resize(realistic_pb):
    """Pixels flow through the in-graph resizer: different-brightness
    images of DIFFERENT raw sizes produce the expected scores without
    any host-side resize."""

    from megadetector_tpu.detection.tf_detector import TFDetector

    detector = TFDetector(realistic_pb)

    bright = np.full((80, 100, 3), 200, dtype=np.uint8)
    dark = np.full((200, 40, 3), 20, dtype=np.uint8)

    r_bright = detector.generate_detections_one_image(
        bright, 'bright.jpg', detection_threshold=0.05)
    r_dark = detector.generate_detections_one_image(
        dark, 'dark.jpg', detection_threshold=0.05)

    assert r_bright['detections'] is not None
    assert r_dark['detections'] is not None
    # mean(200)/255 = 0.784..., mean(20)/255 = 0.0784...
    assert r_bright['detections'][0]['conf'] == \
        pytest.approx(200 / 255, abs=2e-3)
    assert r_dark['detections'][0]['conf'] == \
        pytest.approx(20 / 255, abs=2e-3)
    # [y1,x1,y2,x2] -> [x,y,w,h]
    assert r_bright['detections'][0]['bbox'] == \
        pytest.approx([0.2, 0.1, 0.4, 0.4], abs=1e-3)


def test_tf_detector_batch1_contract(realistic_pb):
    """The graph rejects batch > 1 in-graph; the detector's batch API
    loops singly so multi-image requests still succeed; direct misuse
    is contained as an inference failure."""

    from megadetector_tpu.detection.tf_detector import TFDetector

    detector = TFDetector(realistic_pb)
    imgs = [np.full((60, 60, 3), 100, dtype=np.uint8),
            np.full((90, 50, 3), 150, dtype=np.uint8)]
    batch = detector.generate_detections_one_batch(
        imgs, ['a.jpg', 'b.jpg'], detection_threshold=0.05)
    assert [r['file'] for r in batch] == ['a.jpg', 'b.jpg']
    assert all(r['detections'] is not None for r in batch)

    # Feeding a stacked batch directly violates the in-graph contract
    # and must surface as a contained failure, not a crash
    stacked_as_image = np.stack(
        [np.full((60, 60, 3), 100, dtype=np.uint8)] * 2)
    result = detector.generate_detections_one_image(
        stacked_as_image[0][None].repeat(2, axis=0)[0],
        'ok.jpg', detection_threshold=0.05)
    assert result['detections'] is not None


def test_tf_detector_variable_input_sizes(realistic_pb):
    """Real graphs accept any input resolution (the resizer is
    in-graph); sweep several raw sizes through one session."""

    from megadetector_tpu.detection.tf_detector import TFDetector

    detector = TFDetector(realistic_pb)
    for shape in [(31, 77, 3), (512, 384, 3), (64, 64, 3)]:
        img = np.full(shape, 128, dtype=np.uint8)
        r = detector.generate_detections_one_image(
            img, 'x.jpg', detection_threshold=0.05)
        assert r['detections'] is not None
        assert r['detections'][0]['conf'] == \
            pytest.approx(128 / 255, abs=2e-3)


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
