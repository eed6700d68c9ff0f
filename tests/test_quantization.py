"""int8 quantized-inference tests."""

import numpy as np
import pytest

import jax

from megadetector_tpu.models import yolov5
from megadetector_tpu.ops.quantization import (is_quantized,
                                               quantize_conv_weight,
                                               quantize_params)


def test_quantize_conv_weight_round_trip():
    rng = np.random.RandomState(0)
    w = rng.standard_normal((3, 3, 64, 128)).astype(np.float32)
    w_q, scale = quantize_conv_weight(w)
    assert w_q.dtype == np.int8
    assert scale.shape == (128,)
    w_back = w_q.astype(np.float32) * scale
    # Quantization error bounded by half a step per channel
    err = np.abs(w_back - w)
    assert np.all(err <= scale / 2 + 1e-7)


def test_quantize_params_structure():
    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    params = yolov5.init_params(cfg, seed=0)
    q = quantize_params(params)
    # Stem conv (3 input channels) stays float; large convs quantize
    assert not is_quantized(q['l0'])
    found_quantized = any(
        is_quantized(node)
        for layer in q.values() if isinstance(layer, dict)
        for node in layer.values() if isinstance(node, dict))
    assert found_quantized
    # Detect heads stay float (tiny output channels)
    detect = q['l{}'.format(len(cfg.layers) - 1)]
    assert all('w' in head for head in detect.values())


def test_quantized_forward_close_to_float():
    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    params = yolov5.init_params(cfg, seed=0)
    q = quantize_params(params)

    rng = np.random.RandomState(1)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)

    out_f = np.asarray(jax.jit(
        lambda p, x: yolov5.apply(cfg, p, x))(params, x))
    out_q = np.asarray(jax.jit(
        lambda p, x: yolov5.apply(cfg, p, x))(q, x))

    assert out_f.shape == out_q.shape
    # Objectness/class probabilities (sigmoid outputs) stay close; box
    # coordinates (canvas pixels) within a few pixels
    probs_err = np.abs(out_f[..., 4:] - out_q[..., 4:])
    assert np.percentile(probs_err, 99) < 0.1, \
        '99p prob err {:.4f}'.format(np.percentile(probs_err, 99))
    box_err = np.abs(out_f[..., :4] - out_q[..., :4])
    assert np.percentile(box_err, 99) < 8.0, \
        '99p box err {:.2f}px'.format(np.percentile(box_err, 99))
