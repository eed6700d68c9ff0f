"""
Pallas chained-int8 conv kernel (ops/pallas_conv.py): interpret-mode
numerics vs the XLA chain path, backend routing, and fallback behavior.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megadetector_tpu.ops import pallas_conv
from megadetector_tpu.ops import quantization as q


def _make_conv_params(rng, c_in, c_out, y_scale=0.03):
    w = rng.uniform(-0.4, 0.4, (3, 3, c_in, c_out)).astype(np.float32)
    w_q, w_scale = q.quantize_conv_weight(w)
    return q.QConvParams({
        'w_q': jnp.asarray(w_q), 'w_scale': jnp.asarray(w_scale),
        'b': jnp.asarray(rng.uniform(-0.2, 0.2, (c_out,)), jnp.float32),
        'x_scale': 0.011, 'y_scale': y_scale})


def _xla_reference(params, x, y_scale):
    acc = jax.lax.conv_general_dilated(
        x.q, params['w_q'], window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (
        jnp.asarray(params['w_scale'], jnp.float32)
        * np.float32(x.scale)) + jnp.asarray(params['b'], jnp.float32)
    y = y * jax.nn.sigmoid(y)
    return np.asarray(jnp.clip(jnp.round(y / np.float32(y_scale)),
                               -127, 127).astype(jnp.int8))


@pytest.mark.parametrize('shape', [(2, 16, 16, 128, 128),
                                   (1, 24, 40, 128, 256),
                                   (1, 10, 8, 256, 128)])
def test_kernel_matches_xla_exactly(shape):
    bsz, h, w, c, cout = shape
    rng = np.random.RandomState(0)
    params = _make_conv_params(rng, c, cout)
    xq = jnp.asarray(
        rng.randint(-127, 128, (bsz, h, w, c)).astype(np.int8))
    x = q.QTensor(xq, 0.007)

    want = _xla_reference(params, x, float(params['y_scale']))
    scale = np.asarray(params['w_scale'], np.float32) * np.float32(x.scale)
    got = np.asarray(pallas_conv.conv3x3_chain(
        xq, params['w_q'], scale, params['b'],
        float(params['y_scale']), interpret=True))
    assert np.array_equal(want, got)


def test_chained_conv_routes_to_pallas():
    """With the 'pallas-interpret' backend, chained_conv must route a
    supported conv through the kernel and match the XLA path exactly."""

    rng = np.random.RandomState(1)
    params = _make_conv_params(rng, 128, 128)
    x = q.QTensor(jnp.asarray(
        rng.randint(-127, 128, (1, 16, 16, 128)).astype(np.int8)), 0.009)

    try:
        q.set_conv_backend('pallas-interpret')
        got = q.chained_conv(params, x, 1, 1)
    finally:
        q.set_conv_backend('xla')
    ref = q.chained_conv(params, x, 1, 1)

    assert isinstance(got, q.QTensor)
    assert got.scale == ref.scale == float(params['y_scale'])
    assert np.array_equal(np.asarray(got.q), np.asarray(ref.q))


@pytest.mark.parametrize('case', ['stride2', 'narrow_channels',
                                  'unaligned_width', 'no_act'])
def test_unsupported_shapes_fall_back(case):
    """Unsupported convs must fall back to XLA (identical results with
    either backend) rather than fail."""

    rng = np.random.RandomState(2)
    if case == 'narrow_channels':
        params = _make_conv_params(rng, 64, 64)
        x_shape, stride, act = (1, 16, 16, 64), 1, True
    elif case == 'unaligned_width':
        params = _make_conv_params(rng, 128, 128)
        x_shape, stride, act = (1, 16, 12, 128), 1, True
    elif case == 'no_act':
        params = _make_conv_params(rng, 128, 128)
        x_shape, stride, act = (1, 16, 16, 128), 1, False
    else:
        params = _make_conv_params(rng, 128, 128)
        x_shape, stride, act = (1, 16, 16, 128), 2, True

    x = q.QTensor(jnp.asarray(
        rng.randint(-127, 128, x_shape).astype(np.int8)), 0.008)
    try:
        q.set_conv_backend('pallas-interpret')
        got = q.chained_conv(params, x, stride, 1, act=act)
    finally:
        q.set_conv_backend('xla')
    ref = q.chained_conv(params, x, stride, 1, act=act)
    assert np.array_equal(np.asarray(got.q), np.asarray(ref.q))


def test_supports_predicate():
    assert pallas_conv.supports((1, 16, 16, 128), (3, 3, 128, 128), 1, 1)
    assert not pallas_conv.supports((1, 16, 16, 128), (1, 1, 128, 128),
                                    1, 0)
    assert not pallas_conv.supports((1, 16, 16, 64), (3, 3, 64, 128), 1, 1)
    assert not pallas_conv.supports((1, 16, 12, 128), (3, 3, 128, 128),
                                    1, 1)
    assert not pallas_conv.supports((1, 16, 16, 128), (3, 3, 128, 128),
                                    2, 1)
    # VMEM guard: enormous channel counts stay on XLA
    assert not pallas_conv.supports((1, 8, 8, 1024), (3, 3, 1024, 1024),
                                    1, 1)


def test_detector_option_sets_backend(tmp_path):
    """The conv_backend detector option must reach the quantization
    module's trace-time global."""

    from megadetector_tpu.models import yolov5
    from megadetector_tpu.models.convert_weights import save_checkpoint
    from megadetector_tpu.models.detector import TPUDetector

    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    path = str(tmp_path / 'model.npz')
    save_checkpoint(yolov5.init_params(cfg, seed=0), path, {
        'arch': 'yolov5n', 'model_type': 'yolov5', 'num_classes': 3,
        'image_size': 96, 'anchors': cfg.anchors.tolist()})

    try:
        det = TPUDetector(path, detector_options={
            'conv_backend': 'pallas'})
        assert det._conv_backend == 'pallas'
        assert q.get_conv_backend() == 'pallas'
        det2 = TPUDetector(path)
        assert det2._conv_backend == 'xla'
        assert q.get_conv_backend() == 'xla'
        # building a program on the first detector re-asserts its choice
        det._assert_trace_globals()
        assert q.get_conv_backend() == 'pallas'
    finally:
        q.set_conv_backend('xla')
