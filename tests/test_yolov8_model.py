"""YOLOv8 (anchor-free, MDv1000 family) architecture and converter tests."""

import numpy as np
import pytest

import jax

from megadetector_tpu.models import yolov8


@pytest.fixture(scope='module')
def v8n_config():
    return yolov8.YoloV8Config('yolov8n', num_classes=3)


def _reorder_jax_to_torch(jax_out, config, h, w):
    """JAX flattens [H, W]; torch flattens [H*W] too — same order, so only
    level concatenation order matters (identical). Direct compare works."""

    return jax_out


def test_config_channels(v8n_config):
    # yolov8n: first conv 16 channels, P5 c2f out 256
    assert v8n_config.layers[0]['c_out'] == 16
    assert v8n_config.layers[21]['c_out'] == 256
    assert v8n_config.reg_max == 16


def test_forward_shape(v8n_config):
    params = yolov8.init_params(v8n_config)
    x = np.random.RandomState(0).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32)
    out = jax.jit(lambda p, x: yolov8.apply(v8n_config, p, x))(params, x)
    # A = 8^2 + 4^2 + 2^2 = 84 (no anchor multiplicity)
    assert out.shape == (2, 84, 8)
    # obj column is exactly 1
    np.testing.assert_array_equal(np.asarray(out[..., 4]),
                                  np.ones((2, 84), np.float32))


def test_param_count_v8l():
    cfg = yolov8.YoloV8Config('yolov8l', num_classes=3)
    params = yolov8.init_params(cfg)
    n = yolov8.num_params(params)
    # yolov8l is ~43.6M params (nc=80); nc=3 slightly less
    assert 40e6 < n < 46e6


def test_torch_parity_v8(v8n_config):
    torch = pytest.importorskip('torch')
    from torch_yolo8_ref import make_torch_v8

    model = make_torch_v8(v8n_config, seed=0)
    state = {k: v.detach().numpy()
             for k, v in model.state_dict().items()}
    params = yolov8.convert_ultralytics_state_dict(state, v8n_config)

    x = np.random.RandomState(3).uniform(
        0, 1, (1, 96, 64, 3)).astype(np.float32)
    with torch.no_grad():
        torch_out = model(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    jax_out = np.asarray(
        jax.jit(lambda p, x: yolov8.apply(v8n_config, p, x))(params, x))

    assert torch_out.shape == jax_out.shape
    np.testing.assert_allclose(jax_out, torch_out, atol=5e-4, rtol=1e-3)


def test_nms_works_on_v8_output(v8n_config):
    from megadetector_tpu.ops.nms import batched_nms
    params = yolov8.init_params(v8n_config)
    x = np.random.RandomState(1).uniform(
        0, 1, (1, 64, 64, 3)).astype(np.float32)
    pred = yolov8.apply(v8n_config, params, x)
    out = batched_nms(np.asarray(pred), 0.25, 0.6, max_det=50,
                      pre_nms_topk=84)
    assert out['boxes'].shape == (1, 50, 4)
