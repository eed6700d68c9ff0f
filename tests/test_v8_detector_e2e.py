"""End-to-end test: full .pt -> convert -> TPUDetector flow for the
anchor-free (MDv1000-style) model family."""

import numpy as np
import pytest

from megadetector_tpu.models import yolov8


def test_v8_checkpoint_conversion_and_detection(tmp_path):
    torch = pytest.importorskip('torch')
    from torch_yolo8_ref import make_torch_v8
    from megadetector_tpu.models.convert_weights import \
        convert_megadetector_checkpoint
    from megadetector_tpu.models.detector import TPUDetector

    cfg = yolov8.YoloV8Config('yolov8n', num_classes=3)
    model = make_torch_v8(cfg, seed=2)
    model.names = ['animal', 'person', 'vehicle']
    ckpt_path = str(tmp_path / 'md_v1000-test.pt')
    torch.save({'model': model}, ckpt_path)

    out_path = str(tmp_path / 'converted.npz')
    convert_megadetector_checkpoint(
        ckpt_path, out_path, model_version='v1000.0.0-redwood',
        image_size=64)

    import json
    with open(str(tmp_path / 'converted.metadata.json')) as f:
        meta = json.load(f)
    assert meta['model_type'] == 'ultralytics'
    assert meta['arch'] == 'yolov8n'
    assert meta['num_classes'] == 3

    detector = TPUDetector(out_path)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (60, 80, 3), dtype=np.uint8)
    result = detector.generate_detections_one_image(
        img, 'x.jpg', detection_threshold=0.1)
    assert result['detections'] is not None
    for det in result['detections']:
        assert det['category'] in ('1', '2', '3')
        x, y, w, h = det['bbox']
        assert -0.001 <= x and x + w <= 1.001
