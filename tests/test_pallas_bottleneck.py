"""
Fused int8 bottleneck kernel (ops/pallas_bottleneck.py): interpret-mode
bit-exactness vs the unfused XLA chain (chained_conv x2 + qt_add),
backend routing through models.yolov5._c3, and fallback behavior.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from megadetector_tpu.ops import pallas_bottleneck
from megadetector_tpu.ops import quantization as q


def _conv_params(rng, k, c_in, c_out, y_scale):
    w = rng.uniform(-0.4, 0.4, (k, k, c_in, c_out)).astype(np.float32)
    w_q, w_scale = q.quantize_conv_weight(w)
    return q.QConvParams({
        'w_q': jnp.asarray(w_q), 'w_scale': jnp.asarray(w_scale),
        'b': jnp.asarray(rng.uniform(-0.2, 0.2, (c_out,)), jnp.float32),
        'x_scale': 0.011, 'y_scale': y_scale})


def _bottleneck_params(rng, c):
    return {'cv1': _conv_params(rng, 1, c, c, 0.021),
            'cv2': _conv_params(rng, 3, c, c, 0.033)}


def _unfused(m, x, shortcut):
    h = q.chained_conv(m['cv1'], x, 1, 0)
    h = q.chained_conv(m['cv2'], h, 1, 1)
    return q.qt_add(x, h) if shortcut else h


def _assert_int8_close(got, ref, max_abs=1, max_frac=0.05):
    """Non-shortcut paths are bit-exact; across the residual
    dequant-add-requant, FMA contraction (the fused kernel keeps the
    h*scale product at full precision where the eager op-by-op path
    rounds it to f32) can flip a rounding by 1 lsb on a small fraction
    of near-tie elements."""

    diff = np.abs(np.asarray(got, np.int32) - np.asarray(ref, np.int32))
    assert diff.max() <= max_abs, diff.max()
    assert (diff != 0).mean() <= max_frac, (diff != 0).mean()


@pytest.mark.parametrize('shortcut', [True, False])
@pytest.mark.parametrize('shape', [(2, 12, 16, 128),
                                   (1, 9, 8, 128)])
def test_fused_matches_unfused_exactly(shape, shortcut):
    bsz, h, w, c = shape
    rng = np.random.RandomState(0)
    m = _bottleneck_params(rng, c)
    x = q.QTensor(jnp.asarray(
        rng.randint(-127, 128, (bsz, h, w, c)).astype(np.int8)), 0.007)

    ref = _unfused(m, x, shortcut)

    try:
        q.set_conv_backend('pallas-interpret')
        got = q.fused_bottleneck(m, x, shortcut)
    finally:
        q.set_conv_backend('xla')

    assert got is not None
    assert got.scale == ref.scale
    if shortcut:
        _assert_int8_close(got.q, ref.q)
    else:
        assert np.array_equal(np.asarray(got.q), np.asarray(ref.q))


def test_multiband_edge_rows_exact():
    """The h1 halo must be zeroed at IMAGE edges only — interior band
    boundaries read the real neighbor rows. A tall input forces
    multiple bands."""

    rng = np.random.RandomState(3)
    c = 128
    m = _bottleneck_params(rng, c)
    x = q.QTensor(jnp.asarray(
        rng.randint(-127, 128, (1, 60, 8, c)).astype(np.int8)), 0.009)

    ref = _unfused(m, x, True)
    try:
        q.set_conv_backend('pallas-interpret')
        got = q.fused_bottleneck(m, x, True)
    finally:
        q.set_conv_backend('xla')
    _assert_int8_close(got.q, ref.q)


def test_c3_routes_bottlenecks():
    """yolov5._c3 must produce identical results with the fused backend
    (interpret) and the XLA backend on a chain-quantized C3 block."""

    from megadetector_tpu.models import yolov5

    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    # find a c3 entry and build real chain-quantized params for it
    rng = np.random.RandomState(5)
    c = 256
    ch = c // 2
    params = {
        'cv1': _conv_params(rng, 1, c, ch, 0.02),
        'cv2': _conv_params(rng, 1, c, ch, 0.02),
        'cv3': _conv_params(rng, 1, c, c, 0.03),
        'm0': {'cv1': _conv_params(rng, 1, ch, ch, 0.02),
               'cv2': _conv_params(rng, 3, ch, ch, 0.03)},
        'm1': {'cv1': _conv_params(rng, 1, ch, ch, 0.02),
               'cv2': _conv_params(rng, 3, ch, ch, 0.03)},
    }
    x = q.QTensor(jnp.asarray(
        rng.randint(-127, 128, (1, 8, 8, c)).astype(np.int8)), 0.006)

    ref = yolov5._c3(params, x, 2, True)
    try:
        q.set_conv_backend('pallas-interpret')
        got = yolov5._c3(params, x, 2, True)
    finally:
        q.set_conv_backend('xla')
    assert got.scale == ref.scale
    # the +/-1 lsb residual-add contraction difference amplifies
    # through the second bottleneck and cv3 (a conv sums 128 of them);
    # bound the propagated drift rather than pin exact
    _assert_int8_close(got.q, ref.q, max_abs=6, max_frac=0.20)


def test_c3_folded_routes_bottlenecks():
    """_c3_folded's bottlenecks are the same fusable shape (the folded
    3x3 kernel already encodes the original receptive field); the fused
    backend must match XLA on the folded path too."""

    from megadetector_tpu.models import yolov5

    rng = np.random.RandomState(11)
    c = 256       # folded 2*ch lanes
    ch = c // 2
    params = {
        'cv12': _conv_params(rng, 1, c, c, 0.02),
        'cv3': _conv_params(rng, 1, c, c, 0.03),
        'm0': {'cv1': _conv_params(rng, 1, ch, ch, 0.02),
               'cv2': _conv_params(rng, 3, ch, ch, 0.03)},
    }
    x = q.QTensor(jnp.asarray(
        rng.randint(-127, 128, (1, 12, 8, c)).astype(np.int8)), 0.006)

    ref = yolov5._c3_folded(params, x, 1, True)
    try:
        q.set_conv_backend('pallas-interpret')
        got = yolov5._c3_folded(params, x, 1, True)
    finally:
        q.set_conv_backend('xla')
    assert got.scale == ref.scale
    _assert_int8_close(got.q, ref.q, max_abs=2, max_frac=0.10)


def test_unsupported_returns_none():
    rng = np.random.RandomState(7)
    try:
        q.set_conv_backend('pallas-interpret')
        # narrow channels
        m = _bottleneck_params(rng, 64)
        x = q.QTensor(jnp.asarray(
            rng.randint(-127, 128, (1, 8, 8, 64)).astype(np.int8)), 0.01)
        assert q.fused_bottleneck(m, x, True) is None
        # unaligned width
        m = _bottleneck_params(rng, 128)
        x = q.QTensor(jnp.asarray(
            rng.randint(-127, 128, (1, 8, 12, 128)).astype(np.int8)),
            0.01)
        assert q.fused_bottleneck(m, x, True) is None
        # float input (chain entry not yet quantized)
        x = jnp.zeros((1, 8, 8, 128), jnp.float32)
        assert q.fused_bottleneck(m, x, True) is None
        # xla backend never routes
        q.set_conv_backend('xla')
        x = q.QTensor(jnp.zeros((1, 8, 8, 128), jnp.int8), 0.01)
        assert q.fused_bottleneck(m, x, True) is None
    finally:
        q.set_conv_backend('xla')


def test_supports_predicate():
    ok = (1, 16, 16, 128)
    assert pallas_bottleneck.supports(ok, (1, 1, 128, 128),
                                      (3, 3, 128, 128))
    # cv1 must be 1x1, cv2 3x3
    assert not pallas_bottleneck.supports(ok, (3, 3, 128, 128),
                                          (3, 3, 128, 128))
    # channel-changing bottlenecks stay unfused
    assert not pallas_bottleneck.supports(ok, (1, 1, 128, 256),
                                          (3, 3, 256, 256))
    # lane alignment
    assert not pallas_bottleneck.supports((1, 16, 16, 64),
                                          (1, 1, 64, 64), (3, 3, 64, 64))
    # VMEM guard
    big = (1, 8, 8, 1280)
    assert not pallas_bottleneck.supports(big, (1, 1, 1280, 1280),
                                          (3, 3, 1280, 1280))


@pytest.mark.parametrize('variant', ['im2col', 'im2col3'])
@pytest.mark.parametrize('shortcut', [True, False])
def test_kcontracted_variants_bitwise_match_taps(variant, shortcut):
    """The K-contracted cv2 schedules (VERDICT-r4 item 2: one
    output-stationary K=9C dot / per-dy K=3C dots) compute the same
    exact integer contraction as the taps form — outputs must be
    BIT-IDENTICAL, including across band boundaries and image edges."""

    rng = np.random.RandomState(17)
    c = 128
    m = _bottleneck_params(rng, c)
    # tall enough for multiple bands in interpret mode
    x = q.QTensor(jnp.asarray(
        rng.randint(-127, 128, (2, 12, 8, c)).astype(np.int8)), 0.007)

    def run(v):
        s_in = float(x.scale)
        cv1, cv2 = m['cv1'], m['cv2']
        scale1 = jnp.asarray(cv1['w_scale'], jnp.float32) * \
            np.float32(s_in)
        scale2 = jnp.asarray(cv2['w_scale'], jnp.float32) * \
            np.float32(float(cv1['y_scale']))
        out_q, out_scale = pallas_bottleneck.bottleneck_chain(
            x.q, cv1['w_q'], scale1, cv1['b'], float(cv1['y_scale']),
            cv2['w_q'], scale2, cv2['b'], float(cv2['y_scale']),
            s_in, shortcut, interpret=True, variant=v)
        return np.asarray(out_q), out_scale

    ref_q, ref_scale = run('taps')
    got_q, got_scale = run(variant)
    assert got_scale == ref_scale
    assert np.array_equal(got_q, ref_q)


def test_variant_global_routes_fused_bottleneck():
    """quantization.fused_bottleneck must honor the module-global
    variant selector (identical results, and supports() consulted with
    the variant's own VMEM footprint)."""

    rng = np.random.RandomState(23)
    c = 128
    m = _bottleneck_params(rng, c)
    x = q.QTensor(jnp.asarray(
        rng.randint(-127, 128, (1, 8, 8, c)).astype(np.int8)), 0.009)

    try:
        q.set_conv_backend('pallas-interpret')
        ref = q.fused_bottleneck(m, x, True)
        pallas_bottleneck.set_variant('im2col')
        got = q.fused_bottleneck(m, x, True)
    finally:
        pallas_bottleneck.set_variant('taps')
        q.set_conv_backend('xla')
    assert got is not None and ref is not None
    assert got.scale == ref.scale
    assert np.array_equal(np.asarray(got.q), np.asarray(ref.q))
