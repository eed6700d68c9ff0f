"""
Architecture and converter parity tests: the JAX YOLOv5 network vs an
independent torch implementation with identical weights.
"""

import numpy as np
import pytest

import jax

from megadetector_tpu.models import yolov5
from megadetector_tpu.models.convert_weights import (
    convert_yolov5_state_dict, flatten_params, unflatten_params,
    save_checkpoint, load_checkpoint, fuse_conv_bn)


@pytest.fixture(scope='module')
def small_config():
    return yolov5.YoloV5Config('yolov5n', num_classes=3)


@pytest.fixture(scope='module')
def small_p6_config():
    return yolov5.YoloV5Config('yolov5n6', num_classes=3)


def _state_dict_numpy(model):
    return {k: v.detach().cpu().numpy()
            for k, v in model.state_dict().items()}


def _reorder_jax_to_torch(jax_out, config, h, w):
    """
    The JAX decode flattens each level as [H, W, na, no]; torch flattens as
    [na, H, W, no]. Permute per level so rows align exactly.
    """

    na = config.num_anchors
    no = config.num_outputs
    blocks = []
    offset = 0
    for stride in config.strides:
        ny, nx = h // stride, w // stride
        n = ny * nx * na
        block = jax_out[:, offset:offset + n, :]
        block = block.reshape(jax_out.shape[0], ny, nx, na, no)
        block = np.transpose(block, (0, 3, 1, 2, 4))
        blocks.append(block.reshape(jax_out.shape[0], n, no))
        offset += n
    assert offset == jax_out.shape[1]
    return np.concatenate(blocks, axis=1)


def test_config_shapes(small_config):
    # yolov5n: first conv 16 channels, last C3 256
    assert small_config.layers[0]['c_out'] == 16
    assert small_config.layers[-2]['c_out'] == 256
    assert small_config.strides == (8, 16, 32)


@pytest.mark.slow
def test_param_count_l6():
    cfg = yolov5.YoloV5Config('yolov5l6', num_classes=3)
    params = yolov5.init_params(cfg)
    n = yolov5.num_params(params)
    # YOLOv5l6 (fused, nc=3) is ~76.1M parameters
    assert 75e6 < n < 77e6


def test_forward_output_shape(small_config):
    params = yolov5.init_params(small_config)
    x = np.random.RandomState(0).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32)
    out = jax.jit(lambda p, x: yolov5.apply(small_config, p, x))(params, x)
    # A = (8^2 + 4^2 + 2^2) * 3 = 252
    assert out.shape == (2, 252, 8)
    assert bool(np.isfinite(np.asarray(out)).all())


def test_torch_parity_p5(small_config):
    torch = pytest.importorskip('torch')
    from torch_yolo_ref import make_torch_model

    model = make_torch_model(small_config, seed=0)
    state = _state_dict_numpy(model)
    params, anchors = convert_yolov5_state_dict(state, small_config)
    assert anchors is not None
    np.testing.assert_allclose(anchors, small_config.anchors, atol=1e-5)

    rng = np.random.RandomState(3)
    x = rng.uniform(0, 1, (2, 96, 64, 3)).astype(np.float32)

    with torch.no_grad():
        torch_out = model(
            torch.tensor(x.transpose(0, 3, 1, 2))).numpy()

    jax_out = np.asarray(
        jax.jit(lambda p, x: yolov5.apply(small_config, p, x))(params, x))

    assert torch_out.shape == jax_out.shape
    jax_aligned = _reorder_jax_to_torch(jax_out, small_config, 96, 64)
    np.testing.assert_allclose(jax_aligned, torch_out, atol=2e-4, rtol=1e-3)


def test_torch_parity_p6(small_p6_config):
    torch = pytest.importorskip('torch')
    from torch_yolo_ref import make_torch_model

    model = make_torch_model(small_p6_config, seed=1)
    state = _state_dict_numpy(model)
    params, anchors = convert_yolov5_state_dict(state, small_p6_config)

    rng = np.random.RandomState(4)
    x = rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        torch_out = model(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    jax_out = np.asarray(
        jax.jit(lambda p, x: yolov5.apply(small_p6_config, p, x))(params, x))
    assert torch_out.shape == jax_out.shape
    jax_aligned = _reorder_jax_to_torch(jax_out, small_p6_config, 128, 128)
    np.testing.assert_allclose(jax_aligned, torch_out, atol=2e-4, rtol=1e-3)


def test_fuse_conv_bn_math():
    torch = pytest.importorskip('torch')
    import torch.nn as nn

    conv = nn.Conv2d(4, 8, 3, padding=1, bias=False)
    bn = nn.BatchNorm2d(8, eps=1e-3)
    bn.running_mean.copy_(torch.rand(8))
    bn.running_var.copy_(torch.rand(8) + 0.5)
    bn.weight.data.copy_(torch.rand(8) + 0.5)
    bn.bias.data.copy_(torch.rand(8))
    conv.eval()
    bn.eval()

    x = torch.rand(1, 4, 8, 8)
    with torch.no_grad():
        expected = bn(conv(x)).numpy()

    w, b = fuse_conv_bn(conv.weight.detach().numpy(),
                        bn.weight.detach().numpy(),
                        bn.bias.detach().numpy(),
                        bn.running_mean.numpy(),
                        bn.running_var.numpy())
    fused = nn.Conv2d(4, 8, 3, padding=1, bias=True)
    fused.weight.data.copy_(torch.tensor(w))
    fused.bias.data.copy_(torch.tensor(b))
    with torch.no_grad():
        got = fused(x).numpy()
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_flatten_round_trip(small_config):
    params = yolov5.init_params(small_config)
    flat = flatten_params(params)
    assert all('/' in k or k.startswith('l') for k in flat)
    back = unflatten_params(flat)
    orig_leaves = jax.tree_util.tree_leaves(params)
    back_leaves = jax.tree_util.tree_leaves(back)
    assert len(orig_leaves) == len(back_leaves)
    for a, b in zip(orig_leaves, back_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_save_load(tmp_path, small_config):
    params = yolov5.init_params(small_config)
    meta = {'model_version_string': 'v5a.0.1', 'num_classes': 3,
            'image_size': 1280}
    path = str(tmp_path / 'model.npz')
    save_checkpoint(params, path, meta)
    loaded, loaded_meta = load_checkpoint(path)
    assert loaded_meta['model_version_string'] == 'v5a.0.1'
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_extract_torch_state_dict(tmp_path, small_config):
    """Full checkpoint-file round trip through the stub unpickler."""

    torch = pytest.importorskip('torch')
    from torch_yolo_ref import make_torch_model

    model = make_torch_model(small_config, seed=5)
    model.names = ['animal', 'person', 'vehicle']
    ckpt_path = str(tmp_path / 'model.pt')
    torch.save({'model': model}, ckpt_path)

    from megadetector_tpu.models.convert_weights import \
        extract_torch_state_dict
    state, extras = extract_torch_state_dict(ckpt_path)
    assert 'model.0.conv.weight' in state
    assert extras.get('names') == ['animal', 'person', 'vehicle']

    params, anchors = convert_yolov5_state_dict(state, small_config)
    x = np.random.RandomState(6).uniform(
        0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        torch_out = model(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    jax_out = np.asarray(yolov5.apply(small_config, params, x))
    jax_aligned = _reorder_jax_to_torch(jax_out, small_config, 64, 64)
    np.testing.assert_allclose(jax_aligned, torch_out, atol=2e-4, rtol=1e-3)
