"""
int8 quantized inference support.

The bf16 forward runs at ~44-53% MFU on v5e; the chip's int8 path gives a
measured ~1.4x on chained convs (see NEXT.md). This module provides the
pieces for a quantized speed mode:

- quantize_conv_params(): offline per-output-channel weight quantization
  (symmetric int8, scale = max|w| / 127)
- quantized conv execution with dynamic per-tensor activation scales
  (abs-max), int8 x int8 -> int32 accumulation on the MXU, and float
  rescale fused into the bias add

Accuracy note: dynamic per-tensor activation quantization costs some
precision vs the f32/bf16 path; this is a documented speed mode whose
detection deltas must be validated against real-weight goldens before
production use (golden tolerances: conf 0.005 / coord 0.001).
"""

import jax
import jax.numpy as jnp
import numpy as np


def quantize_conv_weight(w, axis=-1):
    """
    Symmetric per-output-channel int8 quantization of an HWIO conv weight.
    Returns (w_q int8, scale f32 [c_out]).
    """

    w = np.asarray(w, np.float32)
    max_abs = np.max(np.abs(w), axis=tuple(
        i for i in range(w.ndim) if i != (w.ndim - 1)))
    scale = np.maximum(max_abs, 1e-12) / 127.0
    w_q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return w_q, scale.astype(np.float32)


def quantize_params(params, min_channels=32):
    """
    Quantize every conv weight in a detection-model pytree (dicts with
    'w'/'b' leaves). Small convs (c_in * k * k below a threshold) stay in
    float — they're bandwidth-bound and quantization only costs accuracy.
    Returns a new pytree where quantized convs carry 'w_q', 'w_scale',
    'b' (and drop 'w').
    """

    def convert(node):
        if isinstance(node, dict):
            if 'w' in node and 'b' in node and \
                    getattr(node['w'], 'ndim', 0) == 4:
                w = np.asarray(node['w'])
                k, _, c_in, c_out = w.shape
                if c_in * k * k >= min_channels * 9 and c_out >= 64:
                    w_q, scale = quantize_conv_weight(w)
                    return {'w_q': w_q, 'w_scale': scale,
                            'b': np.asarray(node['b'], np.float32)}
                return {'w': w.astype(np.float32),
                        'b': np.asarray(node['b'], np.float32)}
            return {key: convert(value) for key, value in node.items()}
        return node

    return convert(params)


def quantized_conv(params, x, stride, pad, act=True,
                   accum_dtype=jnp.bfloat16):
    """
    int8 conv with per-tensor activation quantization: static scale when
    the params carry a calibrated 'x_scale' (fused into the elementwise
    chain, no reduction), dynamic abs-max otherwise.

    Args:
        params: {'w_q' int8 HWIO, 'w_scale' f32 [c_out], 'b' f32,
                 optional 'x_scale' f32 scalar}
        x: [B, H, W, C] float activations
        stride, pad: conv geometry
        act: apply SiLU

    Returns:
        float activations (accum_dtype)
    """

    x_f32 = x.astype(jnp.float32)
    if 'x_scale' in params:
        x_scale = jnp.asarray(params['x_scale'], jnp.float32)
    else:
        # Dynamic abs-max per tensor (inference only)
        x_max = jnp.maximum(jnp.max(jnp.abs(x_f32)), 1e-6)
        x_scale = x_max / 127.0
    x_q = jnp.clip(jnp.round(x_f32 / x_scale), -127, 127) \
        .astype(jnp.int8)

    from megadetector_tpu.models.yolov5 import conv_geom
    strides, pads = conv_geom(stride, pad, params['w_q'].shape[0])
    y_i32 = jax.lax.conv_general_dilated(
        x_q, params['w_q'],
        window_strides=strides,
        padding=pads,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32)

    scale = (params['w_scale'] * x_scale).astype(jnp.float32)
    y = y_i32.astype(jnp.float32) * scale + params['b']
    y = y.astype(accum_dtype)
    if act:
        y = y * jax.nn.sigmoid(y)
    return y


def is_quantized(params):
    """True when the conv node carries int8 weights."""

    return isinstance(params, dict) and 'w_q' in params


#%% int8-chained activations
#
# The static-scale path above still round-trips activations through float
# between layers, so conv gains are eaten by HBM traffic. In CHAIN mode
# every conv output is quantized to int8 with a calibrated static scale
# and STAYS int8 in HBM; the dequant -> bias -> SiLU -> requant epilogue
# is elementwise and fuses into the conv, and maxpool / upsample /
# concat operate on int8 directly. Activations then cost 1/2 the HBM
# bytes of bf16 and convs run on the 2x int8 MXU path.
#
# Convs consume int8 inputs AT THE PRODUCER'S SCALE (scale folding):
# since scales are trace-time Python floats and conv is linear in x,
# the producer's scale folds into the epilogue multiplier, so no
# int8->int8 requant ever runs before a conv. Requants exist only where
# a single common grid is structurally required (concat of mixed-scale
# pieces). This is both faster (a materialized requant costs a full
# int8 HBM round trip; they used to appear after every concat/add/pool
# node, whose output scale differs from the calibrated input absmax)
# and strictly more accurate (requantization can only lose precision).


@jax.tree_util.register_pytree_node_class
class QConvParams(dict):
    """
    Param node for a chained int8 conv. A dict whose 'x_scale'/'y_scale'
    entries are STATIC pytree aux data (Python floats) rather than
    leaves: under jit they stay concrete, so dequant multipliers
    constant-fold and QTensor scale bookkeeping works at trace time.
    """

    _STATIC = ('x_scale', 'y_scale', 'res_scale')

    def tree_flatten(self):
        dynamic_keys = tuple(sorted(
            k for k in self if k not in self._STATIC))
        static_items = tuple(sorted(
            (k, float(self[k])) for k in self if k in self._STATIC))
        children = tuple(self[k] for k in dynamic_keys)
        return children, (dynamic_keys, static_items)

    @classmethod
    def tree_unflatten(cls, aux, children):
        dynamic_keys, static_items = aux
        node = cls(zip(dynamic_keys, children))
        node.update(dict(static_items))
        return node


def requalify_quantized(params):
    """
    Recursively convert plain-dict chained-conv nodes (as produced by
    checkpoint load, where scales round-trip as 0-d arrays) back into
    QConvParams with Python-float static scales.
    """

    if isinstance(params, dict):
        if 'y_scale' in params and ('w_q' in params or 'w' in params):
            node = QConvParams(params)
            if 'x_scale' in params:
                node['x_scale'] = float(np.asarray(params['x_scale']))
            node['y_scale'] = float(np.asarray(params['y_scale']))
            if 'res_scale' in params:
                node['res_scale'] = float(np.asarray(params['res_scale']))
            return node
        return type(params)(
            (k, requalify_quantized(v)) for k, v in params.items())
    return params


class QTensor:
    """
    A quantized activation: int8 data + STATIC (Python float) scale.
    Static scales constant-fold under jit, so the dequant multipliers
    are compile-time constants.
    """

    __slots__ = ('q', 'scale')

    def __init__(self, q, scale):
        self.q = q
        self.scale = float(scale)

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):
        return self.q.dtype


def qt_dequant(x, dtype=jnp.float32):
    """QTensor (or float array, passed through) -> float array."""

    if isinstance(x, QTensor):
        return x.q.astype(dtype) * dtype(x.scale)
    return x.astype(dtype) if dtype is not None else x


def qt_quantize(x, scale):
    """float array -> QTensor with static [scale]."""

    q = jnp.clip(jnp.round(x.astype(jnp.float32) / np.float32(scale)),
                 -127, 127).astype(jnp.int8)
    return QTensor(q, scale)


def qt_requant(x, scale):
    """QTensor -> QTensor at a new static scale (f32 elementwise)."""

    if x.scale == scale:
        return x
    ratio = np.float32(x.scale / scale)
    q = jnp.clip(jnp.round(x.q.astype(jnp.float32) * ratio),
                 -127, 127).astype(jnp.int8)
    return QTensor(q, scale)


def qt_concat(xs, axis=-1):
    """Concat QTensors (requanted to the max scale) or float arrays."""

    if all(isinstance(x, QTensor) for x in xs):
        scale = max(x.scale for x in xs)
        return QTensor(
            jnp.concatenate([qt_requant(x, scale).q for x in xs],
                            axis=axis), scale)
    return jnp.concatenate([qt_dequant(x) if isinstance(x, QTensor)
                            else x for x in xs], axis=axis)


def qt_add(a, b):
    """
    Residual add of two QTensors: computed in f32, requantized at the
    bound scale (s_a + s_b) so the sum can't clip. Float fallbacks pass
    through.
    """

    if isinstance(a, QTensor) and isinstance(b, QTensor):
        s = a.scale + b.scale
        y = qt_dequant(a) + qt_dequant(b)
        return qt_quantize(y, s)
    return qt_dequant(a) + qt_dequant(b) if (
        isinstance(a, QTensor) or isinstance(b, QTensor)) else a + b


def qt_maxpool(x, pool_k):
    """Stride-1 same-pad maxpool; int8 is scale-invariant so QTensors
    pool directly."""

    p = pool_k // 2
    if isinstance(x, QTensor):
        pooled = jax.lax.reduce_window(
            x.q, jnp.int8(-128), jax.lax.max,
            window_dimensions=(1, pool_k, pool_k, 1),
            window_strides=(1, 1, 1, 1),
            padding=[(0, 0), (p, p), (p, p), (0, 0)])
        return QTensor(pooled, x.scale)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, pool_k, pool_k, 1),
        window_strides=(1, 1, 1, 1),
        padding=[(0, 0), (p, p), (p, p), (0, 0)])


def qt_upsample2x(x):
    """Nearest 2x upsample; operates on raw int8 for QTensors."""

    arr = x.q if isinstance(x, QTensor) else x
    b, h, w, c = arr.shape
    up = jnp.broadcast_to(arr[:, :, None, :, None, :],
                          (b, h, 2, w, 2, c)).reshape(b, h * 2, w * 2, c)
    return QTensor(up, x.scale) if isinstance(x, QTensor) else up


def chained_conv(params, x, stride, pad, act=True):
    """
    int8-in / int8-out conv: int8 x int8 -> int32 on the MXU, f32
    dequant + bias + SiLU epilogue (fused into the conv by XLA), output
    requantized to the node's calibrated y_scale.

    QTensor inputs are consumed AT THEIR OWN static scale — the conv is
    linear in x, so the producer's scale folds into the epilogue
    multiplier. The calibrated x_scale is used only to quantize float
    inputs (chain entry). Requantizing an int8 tensor onto the
    calibrated grid could only lose information (round-tripping through
    a different grid) and costs a full extra int8 HBM round trip per
    materialized requant (after every concat/add/pool node, whose
    output scale differs from the calibrated input absmax); folding
    removes both. i32 accumulation cannot overflow: 9*1024 products of
    |q| <= 127 stay < 2^31.

    params: {'w_q' int8 HWIO, 'w_scale' f32 [c_out], 'b' f32,
             'x_scale' float, 'y_scale' float}
    x: QTensor or float array.

    Returns QTensor (scale y_scale).
    """

    if isinstance(x, QTensor):
        x_scale = float(x.scale)
        xq = x.q
    else:
        x_scale = float(params['x_scale'])
        xq = qt_quantize(x, x_scale).q

    from megadetector_tpu.models.yolov5 import conv_geom
    strides, pads = conv_geom(stride, pad, params['w_q'].shape[0])

    routed = _pallas_chain_conv(params, xq, x_scale, strides, pads, act)
    if routed is not None:
        return routed

    y_i32 = jax.lax.conv_general_dilated(
        xq, params['w_q'],
        window_strides=strides,
        padding=pads,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32)

    scale = jnp.asarray(params['w_scale'], jnp.float32) * \
        np.float32(x_scale)
    y = y_i32.astype(jnp.float32) * scale + \
        jnp.asarray(params['b'], jnp.float32)
    if act:
        y = y * jax.nn.sigmoid(y)
    return qt_quantize(y, float(params['y_scale']))


# Conv execution backend for chained int8 convs: 'xla' (default),
# 'pallas' (TPU-only; XLA fallback off-TPU and for unsupported shapes),
# or 'pallas-interpret' (tests: Pallas semantics on any backend).
# Process-global because it is a trace-time choice deep inside the
# model apply functions; TPUDetector re-asserts its own setting before
# every program build.
_CONV_BACKEND = 'xla'


def set_conv_backend(backend):
    """Select the chained-conv execution backend (see _CONV_BACKEND)."""

    global _CONV_BACKEND
    assert backend in ('xla', 'pallas', 'pallas-interpret'), backend
    _CONV_BACKEND = backend


def get_conv_backend():
    return _CONV_BACKEND


def _pallas_chain_conv(params, xq, x_scale, strides, pads, act):
    """
    Route a chained conv to the Pallas kernel when selected and
    supported. Returns a QTensor or None (caller falls back to XLA).
    """

    if _CONV_BACKEND == 'xla' or not act:
        return None
    interpret = _CONV_BACKEND == 'pallas-interpret'
    if not interpret and jax.default_backend() != 'tpu':
        return None
    if strides != (1, 1) or list(map(tuple, pads)) != [(1, 1), (1, 1)]:
        return None
    from megadetector_tpu.ops import pallas_conv
    if not pallas_conv.supports(xq.shape, params['w_q'].shape, 1, 1):
        return None
    y_scale = float(params['y_scale'])
    scale = (jnp.asarray(params['w_scale'], jnp.float32)
             * np.float32(x_scale))
    y_q = pallas_conv.conv3x3_chain(
        xq, params['w_q'], scale, params['b'], y_scale,
        interpret=interpret)
    return QTensor(y_q, y_scale)


def fused_bottleneck(m_params, x, shortcut):
    """
    Route a whole CSP bottleneck (1x1 chained conv -> 3x3 chained conv
    -> qt_add residual) to the fused Pallas kernel
    (ops/pallas_bottleneck.py) when the backend selects it and the
    shapes are covered. Returns the output QTensor, or None (caller
    runs the unfused chain). Numerics are bit-exact vs the unfused
    path — the kernel replicates every intermediate int8 rounding.
    """

    if _CONV_BACKEND == 'xla':
        return None
    interpret = _CONV_BACKEND == 'pallas-interpret'
    if not interpret and jax.default_backend() != 'tpu':
        return None
    if not isinstance(x, QTensor):
        return None
    cv1, cv2 = m_params.get('cv1'), m_params.get('cv2')
    for p in (cv1, cv2):
        if p is None or 'w_q' not in p or 'y_scale' not in p:
            return None
    from megadetector_tpu.ops import pallas_bottleneck
    variant = pallas_bottleneck.get_variant()
    if not pallas_bottleneck.supports(x.shape, cv1['w_q'].shape,
                                      cv2['w_q'].shape, variant):
        return None
    s_in = float(x.scale)
    mid_scale = float(cv1['y_scale'])
    scale1 = jnp.asarray(cv1['w_scale'], jnp.float32) * np.float32(s_in)
    scale2 = jnp.asarray(cv2['w_scale'], jnp.float32) * \
        np.float32(mid_scale)
    out_q, out_scale = pallas_bottleneck.bottleneck_chain(
        x.q, cv1['w_q'], scale1, cv1['b'], mid_scale,
        cv2['w_q'], scale2, cv2['b'], float(cv2['y_scale']),
        s_in, shortcut, interpret=interpret, variant=variant)
    return QTensor(out_q, out_scale)


DEFAULT_FLOAT_STORE_LAYERS = ('l0', 'l1', 'l2')

# With width-folded early layers (ops/folding.py) the former <=128-channel
# int8 regression no longer applies to l1/l2 (they present 128-256 lanes);
# hardware-measured best policy keeps only the 12-channel stem float.
DEFAULT_FLOAT_STORE_LAYERS_FOLDED = ('l0',)


def default_float_store(params):
    """Pick the chain-mode float-store policy for a param tree."""

    from megadetector_tpu.ops.folding import params_are_folded
    return DEFAULT_FLOAT_STORE_LAYERS_FOLDED if params_are_folded(params) \
        else DEFAULT_FLOAT_STORE_LAYERS


def quantize_params_chain(params, skip_names=('detect',),
                          keep_float_first=True,
                          float_store_names=DEFAULT_FLOAT_STORE_LAYERS):
    """
    Quantize a yolov5-style param pytree for CHAIN mode: conv nodes get
    w_q/w_scale/b (x_scale/y_scale added by calibrate_chain_scales).

    Layer policy (hardware-measured on v5e @1280px):
    - [float_store_names] (default: the high-resolution low-channel
      early layers l0-l2) stay ENTIRELY float: int8 convs regress at
      <=128 channels, and int8 storage of their outputs also measured
      slower (the quantize/dequantize epilogues on the huge early
      feature maps cost more than the saved HBM traffic).
    - [skip_names] (the detect heads): fully float.
    - everything else: int8 weights, int8 MXU path, int8 storage.
    """

    float_store = tuple(float_store_names or ())

    def convert(node, path):
        if isinstance(node, dict):
            if 'w' in node and 'b' in node and \
                    getattr(node['w'], 'ndim', 0) == 4:
                if path and path[0] in float_store:
                    return {'w': np.asarray(node['w'], np.float32),
                            'b': np.asarray(node['b'], np.float32)}
                w_q, scale = quantize_conv_weight(np.asarray(node['w']))
                return QConvParams(
                    w_q=w_q, w_scale=scale,
                    b=np.asarray(node['b'], np.float32))
            return {key: convert(value, path + (key,))
                    for key, value in node.items()}
        return node

    out = {}
    for key, value in params.items():
        if key in skip_names:
            out[key] = value
        else:
            out[key] = convert(value, (key,))
    return out


def calibrate_chain_scales(apply_fn, config, params_q, sample_images,
                           headroom=1.0):
    """
    Calibrate static x_scale/y_scale for every chained conv node by
    running the (float-fallback) forward with a collector hooked into
    the conv entry points. Modifies params_q in place and returns it.
    """

    global _CALIBRATION_COLLECTOR

    id_to_node = {}

    def walk(node):
        if isinstance(node, dict):
            if 'w_q' in node or isinstance(node, QConvParams):
                id_to_node[id(node)] = node
            else:
                for v in node.values():
                    walk(v)
    walk(params_q)

    collector = []
    _CALIBRATION_COLLECTOR = collector
    try:
        fn = jax.jit(lambda x: (apply_fn(config, params_q, x),
                                [t for _, _, t in collector]))
        _, stats = fn(jnp.asarray(sample_images, jnp.float32))
    finally:
        keys = [(i, which) for i, which, _ in collector]
        _CALIBRATION_COLLECTOR = None

    stats = [float(np.asarray(s)) for s in stats]
    assert len(keys) == len(stats)

    node_max = {}
    for (node_id, which), val in zip(keys, stats):
        cur = node_max.setdefault(node_id, {'in': 0.0, 'out': 0.0})
        cur[which] = max(cur.get(which, 0.0), val)

    n_set = 0
    for node_id, vals in node_max.items():
        node = id_to_node.get(node_id)
        if node is None:
            continue
        if 'w_q' in node:
            node['x_scale'] = float(
                max(vals['in'] * headroom, 1e-6) / 127.0)
        node['y_scale'] = float(
            max(vals['out'] * headroom, 1e-6) / 127.0)
        # Residual-sum scale (recorded by block forwards that add a
        # shortcut onto this conv's output — e.g. efficientnet MBConv
        # projects): quantizing the SUM at its own calibrated absmax
        # avoids the scale inflation of the qt_add bound (s_a + s_b),
        # which would compound over long residual chains (V2-M stage6
        # has 18 blocks).
        if 'res' in vals:
            node['res_scale'] = float(
                max(vals['res'] * headroom, 1e-6) / 127.0)
        n_set += 1
    assert n_set > 0, 'Calibration matched no quantized convs'
    return params_q


#%% Static-scale calibration

# When set (a list), yolov5._conv records (id(param_node), absmax tracer)
# for every conv input — see calibrate_activation_scales()
_CALIBRATION_COLLECTOR = None


def calibrate_activation_scales(apply_fn, config, params_q, sample_images,
                                percentile_headroom=1.0):
    """
    Calibrate static per-tensor activation scales for a quantized param
    pytree.

    Runs the (quantized, dynamic-scale) forward over [sample_images] with
    a collector hooked into the conv entry points, records each quantized
    conv's input abs-max across batches, and bakes
    'x_scale' = max_abs * headroom / 127 into each quantized conv node
    (in place; also returned).

    Args:
        apply_fn: the model's apply (e.g. models.yolov5.apply)
        config: model config
        params_q: quantize_params() output (modified in place)
        sample_images: [N, H, W, 3] float in [0, 1] calibration images
        percentile_headroom: multiplier on the observed max
    """

    global _CALIBRATION_COLLECTOR
    import jax as _jax

    # Map param-node identity -> node (so collector entries resolve)
    id_to_node = {}

    def walk(node):
        if isinstance(node, dict):
            if 'w_q' in node:
                id_to_node[id(node)] = node
            else:
                for v in node.values():
                    walk(v)
    walk(params_q)

    collector = []
    _CALIBRATION_COLLECTOR = collector
    try:
        # Closure over params_q so traced nodes are these exact dicts
        fn = _jax.jit(lambda x: (apply_fn(config, params_q, x),
                                 [t for _, _, t in collector]))
        _, stats = fn(jnp.asarray(sample_images, jnp.float32))
    finally:
        keys = [(i, which) for i, which, _ in collector]
        _CALIBRATION_COLLECTOR = None

    stats = [float(np.asarray(s)) for s in stats]
    assert len(keys) == len(stats)

    node_max = {}
    for (node_id, which), val in zip(keys, stats):
        if which != 'in':
            continue
        node_max[node_id] = max(node_max.get(node_id, 0.0), val)

    n_set = 0
    for node_id, val in node_max.items():
        node = id_to_node.get(node_id)
        if node is None:
            continue
        node['x_scale'] = np.float32(
            max(val * percentile_headroom, 1e-6) / 127.0)
        n_set += 1
    assert n_set > 0, 'Calibration matched no quantized convs'
    return params_q
