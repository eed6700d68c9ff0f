"""
RF-DETR architecture and converter parity tests: the JAX network
(models/rfdetr.py: windowed DINOv2-with-registers backbone, two-stage
proposals, multi-scale deformable-attention decoder with iterative
refinement) vs an independent torch mirror with a realistic RF-DETR
checkpoint key layout (tests/torch_rfdetr_ref.py).
"""

import numpy as np
import pytest

import jax

from megadetector_tpu.models import rfdetr
from megadetector_tpu.models.convert_weights import (
    convert_rfdetr_state_dict, save_checkpoint)

IMAGE_SIZE = 112  # 4 windows x patch 14 x 2


@pytest.fixture(scope='module')
def tiny_config():
    return rfdetr.RFDetrConfig('rfdetr_test', num_classes=3,
                               image_size=IMAGE_SIZE)


def test_config():
    c = rfdetr.RFDetrConfig('rfdetr_base', num_classes=3)
    assert c.vit_dim == 768 and c.dec_layers == 3
    assert c.size_multiple == 56
    assert c.num_queries == 300


def test_forward_shapes(tiny_config):
    c = tiny_config
    params = rfdetr.init_params(c, seed=0)
    x = np.random.RandomState(0).uniform(
        0, 1, (2, IMAGE_SIZE, IMAGE_SIZE, 3)).astype(np.float32)
    out = np.asarray(jax.jit(
        lambda p, x: rfdetr.apply(c, p, x))(params, x))
    assert out.shape == (2, c.num_queries, 5 + c.num_classes)
    assert np.isfinite(out).all()
    # obj column is 1, class scores are probabilities
    assert np.allclose(out[..., 4], 1.0)
    assert (out[..., 5:] >= 0).all() and (out[..., 5:] <= 1).all()
    # boxes within the canvas (cxcywh pixels)
    assert (out[..., 0] >= 0).all() and (out[..., 0] <= IMAGE_SIZE).all()


def test_torch_parity(tiny_config):
    torch = pytest.importorskip('torch')
    from torch_rfdetr_ref import make_torch_rfdetr

    c = tiny_config
    model = make_torch_rfdetr(c, seed=1)
    state = {k: v.detach().cpu().numpy()
             for k, v in model.state_dict().items()}
    params = convert_rfdetr_state_dict(state, c)

    rng = np.random.RandomState(2)
    x = rng.uniform(0, 1, (2, IMAGE_SIZE, IMAGE_SIZE, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        t_logits, t_boxes = model(
            torch.tensor(x.transpose(0, 3, 1, 2)))
    j_logits, j_boxes = jax.jit(
        lambda p, x: rfdetr.apply(c, p, x, decode=False))(params, x)

    t_logits = t_logits.numpy()
    t_boxes = t_boxes.numpy()
    j_logits = np.asarray(j_logits)
    j_boxes = np.asarray(j_boxes)
    assert t_logits.shape == j_logits.shape
    assert t_boxes.shape == j_boxes.shape

    # top_k tie-breaking can reorder queries with equal scores; compare
    # as sorted sets of (box, logit) rows per image
    def canon(logits, boxes):
        rows = np.concatenate([boxes, logits], axis=-1)
        order = np.lexsort(rows.T[::-1])
        return rows[order]

    for b in range(x.shape[0]):
        a = canon(t_logits[b], t_boxes[b])
        bb = canon(j_logits[b], j_boxes[b])
        np.testing.assert_allclose(a, bb, atol=2e-3, rtol=1e-2)


def test_checkpoint_and_detector(tiny_config, tmp_path):
    """Converted RF-DETR checkpoints run through TPUDetector."""

    torch = pytest.importorskip('torch')
    from torch_rfdetr_ref import make_torch_rfdetr
    from megadetector_tpu.models.detector import TPUDetector

    c = tiny_config
    model = make_torch_rfdetr(c, seed=3)
    state = {k: v.detach().cpu().numpy()
             for k, v in model.state_dict().items()}
    params = convert_rfdetr_state_dict(state, c)
    path = str(tmp_path / 'rfdetr_test.npz')
    save_checkpoint(params, path, {
        'metadata_format_version': 1.0,
        'arch': 'rfdetr_test',
        'model_type': 'rfdetr',
        'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': IMAGE_SIZE,
    })

    detector = TPUDetector(path)
    assert detector.letterbox_stride == c.size_multiple
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (90, 120, 3), dtype=np.uint8)
    out = detector.generate_detections_one_image(
        img, 'x.jpg', detection_threshold=0.1)
    assert out['detections'] is not None
    for det in out['detections']:
        assert det['category'] in ('1', '2', '3')
        x, y, w, h = det['bbox']
        assert -0.001 <= x <= 1.001 and w >= 0


def test_unified_cli_converter_routes_rfdetr(tiny_config, tmp_path):
    """md-convert-weights must recognize the RF-DETR key layout and
    route to convert_rfdetr_checkpoint — one converter CLI for every
    detector family (docs/weights-runbook.md section 3)."""

    torch = pytest.importorskip('torch')
    from torch_rfdetr_ref import make_torch_rfdetr
    from megadetector_tpu.models.convert_weights import (
        convert_megadetector_checkpoint, load_checkpoint)

    c = tiny_config
    model = make_torch_rfdetr(c, seed=4)
    ckpt = str(tmp_path / 'sorrel_rfdetr.pth')
    torch.save({'model': model,
                'model_config': {'resolution': IMAGE_SIZE,
                                 'num_classes': 3}}, ckpt)

    out = convert_megadetector_checkpoint(
        ckpt, str(tmp_path / 'sorrel.npz'), arch='rfdetr_test')
    params, metadata = load_checkpoint(out)
    assert metadata['model_type'] == 'rfdetr'
    assert metadata['image_size'] == IMAGE_SIZE
    assert metadata['num_classes'] == 3
    assert 'class_embed' in params or any(
        'class_embed' in k for k in params)
