"""DETR-style (RF-DETR family slot) model tests."""

import numpy as np
import pytest

import jax

from megadetector_tpu.models import detr
from megadetector_tpu.models.convert_weights import save_checkpoint


@pytest.fixture(scope='module')
def tiny_config():
    return detr.DetrConfig('detr_tiny', num_classes=3, image_size=64)


def test_forward_shape(tiny_config):
    params = detr.init_params(tiny_config, seed=0)
    x = np.random.RandomState(0).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32)
    out = jax.jit(lambda p, x: detr.apply(tiny_config, p, x))(params, x)
    assert out.shape == (2, tiny_config.num_queries, 8)
    arr = np.asarray(out)
    assert np.isfinite(arr).all()
    # obj column fixed at 1, boxes within the canvas
    np.testing.assert_array_equal(arr[..., 4], 1.0)
    assert (arr[..., 0] >= 0).all() and (arr[..., 0] <= 64).all()
    # class scores are probabilities
    assert (arr[..., 5:] >= 0).all() and (arr[..., 5:] <= 1).all()


def test_nms_on_detr_output(tiny_config):
    from megadetector_tpu.ops.nms import batched_nms
    params = detr.init_params(tiny_config, seed=1)
    x = np.random.RandomState(1).uniform(
        0, 1, (1, 64, 64, 3)).astype(np.float32)
    pred = np.asarray(detr.apply(tiny_config, params, x))
    out = batched_nms(pred, 0.25, 0.6, max_det=20, pre_nms_topk=32)
    assert out['boxes'].shape == (1, 20, 4)


def test_detr_in_detector(tmp_path):
    from megadetector_tpu.models.detector import TPUDetector

    cfg = detr.DetrConfig('detr_tiny', num_classes=3, image_size=64)
    params = detr.init_params(cfg, seed=2)
    path = str(tmp_path / 'detr.npz')
    save_checkpoint(params, path, {
        'model_version_string': 'rf-detr-test',
        'arch': 'detr_tiny', 'model_type': 'rfdetr',
        'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': 64,
    })
    detector = TPUDetector(path)
    assert detector.letterbox_stride == 16  # ViT patch size
    img = np.random.RandomState(3).randint(
        0, 255, (60, 80, 3), dtype=np.uint8)
    result = detector.generate_detections_one_image(
        img, 'x.jpg', detection_threshold=0.3)
    assert result['detections'] is not None
    for det in result['detections']:
        assert det['category'] in ('1', '2', '3')
