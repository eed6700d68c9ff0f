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

    y_i32 = jax.lax.conv_general_dilated(
        x_q, params['w_q'],
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
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
                                 [t for _, t in collector]))
        _, stats = fn(jnp.asarray(sample_images, jnp.float32))
    finally:
        ids = [i for i, _ in collector]
        _CALIBRATION_COLLECTOR = None

    stats = [float(np.asarray(s)) for s in stats]
    assert len(ids) == len(stats)

    node_max = {}
    for node_id, val in zip(ids, stats):
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
