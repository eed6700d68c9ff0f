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


def test_static_calibration():
    from megadetector_tpu.ops.quantization import (
        calibrate_activation_scales, quantize_params)

    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    params = yolov5.init_params(cfg, seed=0)
    q = quantize_params(params)

    rng = np.random.RandomState(2)
    samples = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    calibrate_activation_scales(yolov5.apply, cfg, q, samples)

    # Every quantized conv got a static scale
    def count(node, key):
        if isinstance(node, dict):
            n = 1 if key in node else 0
            return n + sum(count(v, key) for v in node.values())
        return 0
    assert count(q, 'x_scale') == count(q, 'w_q')
    assert count(q, 'x_scale') > 0

    # Static-scale forward still close to float
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    out_f = np.asarray(jax.jit(
        lambda p, x: yolov5.apply(cfg, p, x))(params, x))
    out_q = np.asarray(jax.jit(
        lambda p, x: yolov5.apply(cfg, p, x))(q, x))
    probs_err = np.abs(out_f[..., 4:] - out_q[..., 4:])
    assert np.percentile(probs_err, 99) < 0.12


def test_quantized_checkpoint_in_detector(tmp_path):
    """Quantized checkpoints load and run through TPUDetector."""

    from megadetector_tpu.models.convert_weights import (
        quantize_checkpoint, save_checkpoint)
    from megadetector_tpu.models.detector import TPUDetector

    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    params = yolov5.init_params(cfg, seed=7)
    f_path = str(tmp_path / 'float.npz')
    save_checkpoint(params, f_path, {
        'model_version_string': 'v5a.0.1', 'arch': 'yolov5n',
        'model_type': 'yolov5', 'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': 64, 'anchors': cfg.anchors.tolist()})

    q_path = str(tmp_path / 'q.npz')
    quantize_checkpoint(f_path, q_path, calibration_image_size=64)

    detector_f = TPUDetector(f_path)
    detector_q = TPUDetector(q_path)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (60, 80, 3), dtype=np.uint8)
    out_f = detector_f.generate_detections_one_image(
        img, 'x.jpg', detection_threshold=0.2)
    out_q = detector_q.generate_detections_one_image(
        img, 'x.jpg', detection_threshold=0.2)
    assert out_q['detections'] is not None
    # The confident detection sets broadly agree between float and int8
    from megadetector_tpu.utils.md_tests import (MDTestOptions,
                                                 compare_detection_lists)
    options = MDTestOptions()
    options.comparison_confidence_threshold = 0.24
    options.iou_match_threshold = 0.6
    options.max_conf_error = 0.05
    options.max_coord_error = 0.05
    r = compare_detection_lists(out_f['detections'],
                                out_q['detections'], options)
    assert len(r['matched']) > 0


def test_chain_forward_close_to_float():
    """int8-in/int8-out chains stay close to the float forward: obj/cls
    within 0.005 at p99, xy within a pixel."""

    from megadetector_tpu.ops import quantization as q

    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    params = yolov5.init_params(cfg, seed=0)
    detect_name = 'l{}'.format(len(cfg.layers) - 1)
    qp = q.quantize_params_chain(params, skip_names=(detect_name,))
    rng = np.random.RandomState(0)
    samples = rng.uniform(0, 1, (2, 96, 96, 3)).astype(np.float32)
    q.calibrate_chain_scales(yolov5.apply, cfg, qp, samples)

    x = rng.uniform(0, 1, (1, 96, 96, 3)).astype(np.float32)
    ref = np.asarray(jax.jit(
        lambda p, x: yolov5.apply(cfg, p, x))(params, x))
    # jit with params as an argument: the production path (static scales
    # must survive the pytree flatten/unflatten round trip)
    got = np.asarray(jax.jit(
        lambda p, x: yolov5.apply(cfg, p, x))(qp, x))

    d_prob = np.abs(ref[..., 4:] - got[..., 4:])
    d_xy = np.abs(ref[..., :2] - got[..., :2])
    assert np.quantile(d_prob, 0.99) < 0.005
    assert d_prob.max() < 0.02
    assert np.quantile(d_xy, 0.99) < 1.0


def test_chain_checkpoint_round_trip(tmp_path):
    """Chain checkpoints round-trip through npz bit-exactly (static
    scales rehydrated as pytree aux data)."""

    from megadetector_tpu.models.convert_weights import (
        save_checkpoint, load_checkpoint)
    from megadetector_tpu.ops import quantization as q

    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    params = yolov5.init_params(cfg, seed=3)
    detect_name = 'l{}'.format(len(cfg.layers) - 1)
    qp = q.quantize_params_chain(params, skip_names=(detect_name,))
    rng = np.random.RandomState(1)
    q.calibrate_chain_scales(
        yolov5.apply, cfg, qp,
        rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))

    path = str(tmp_path / 'chain.npz')
    save_checkpoint(qp, path, {'quantization': 'int8-chain'})
    qp2, meta = load_checkpoint(path)
    assert meta['quantization'] == 'int8-chain'

    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    fn = jax.jit(lambda p, x: yolov5.apply(cfg, p, x))
    np.testing.assert_array_equal(np.asarray(fn(qp, x)),
                                  np.asarray(fn(qp2, x)))


def test_static_mode_still_available(tmp_path):
    """mode='static' (float activations between layers) still works."""

    from megadetector_tpu.models.convert_weights import (
        quantize_checkpoint, save_checkpoint, load_checkpoint)

    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    params = yolov5.init_params(cfg, seed=7)
    f_path = str(tmp_path / 'float.npz')
    save_checkpoint(params, f_path, {
        'model_version_string': 'v5a.0.1', 'arch': 'yolov5n',
        'model_type': 'yolov5', 'num_classes': 3,
        'image_size': 64, 'anchors': cfg.anchors.tolist()})
    q_path = str(tmp_path / 'static.npz')
    quantize_checkpoint(f_path, q_path, calibration_image_size=64,
                        mode='static')
    qp, meta = load_checkpoint(q_path)
    assert meta['quantization'] == 'int8-static'
    rng = np.random.RandomState(2)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    out = np.asarray(jax.jit(
        lambda p, x: yolov5.apply(cfg, p, x))(qp, x))
    assert np.isfinite(out).all()


def test_folded_chain_forward_close_to_float():
    """The production policy — width-folded early layers with the
    folded float-store set ('l0' only; l1/l2 chained int8) — must stay
    within the same accuracy envelope as the unfolded chain: obj/cls
    within 0.005 at p99, xy within a pixel of the FLOAT UNFOLDED
    forward."""

    from megadetector_tpu.ops import folding
    from megadetector_tpu.ops import quantization as q

    cfg = yolov5.YoloV5Config('yolov5n6', num_classes=3)
    params = yolov5.init_params(cfg, seed=0)
    folded = folding.fold_early_params(params, cfg)
    detect_name = 'l{}'.format(len(cfg.layers) - 1)
    qp = q.quantize_params_chain(
        folded, skip_names=(detect_name,),
        float_store_names=q.default_float_store(folded))
    assert 'w' in qp['l0'] and 'w_q' in qp['l1']
    rng = np.random.RandomState(0)
    samples = rng.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32)
    q.calibrate_chain_scales(yolov5.apply, cfg, qp, samples)

    x = rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)
    ref = np.asarray(jax.jit(
        lambda p, x: yolov5.apply(cfg, p, x))(params, x))
    got = np.asarray(jax.jit(
        lambda p, x: yolov5.apply(cfg, p, x))(qp, x))

    d_prob = np.abs(ref[..., 4:] - got[..., 4:])
    d_xy = np.abs(ref[..., :2] - got[..., :2])
    assert np.quantile(d_prob, 0.99) < 0.005
    assert d_prob.max() < 0.03
    assert np.quantile(d_xy, 0.99) < 1.0


def test_quantize_checkpoint_folds_early_layers(tmp_path):
    """Chain-mode checkpoint quantization must fold the early layers
    first (folded l1/l2 are int8-profitable; unfolded they would stay
    float) — the production bench path."""

    from megadetector_tpu.models.convert_weights import (
        load_checkpoint, quantize_checkpoint, save_checkpoint)
    from megadetector_tpu.ops.folding import params_are_folded

    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    params = yolov5.init_params(cfg, seed=3)
    f_path = str(tmp_path / 'float.npz')
    save_checkpoint(params, f_path, {
        'arch': 'yolov5n', 'model_type': 'yolov5', 'num_classes': 3,
        'image_size': 64, 'anchors': cfg.anchors.tolist()})
    q_path = str(tmp_path / 'q.npz')
    quantize_checkpoint(f_path, q_path, calibration_image_size=64)

    qp, meta = load_checkpoint(q_path)
    assert params_are_folded(qp)
    # Folded policy: l0 float-store, l1 int8-chained
    assert 'w' in qp['l0'] and 'w_q' in qp['l1']
    assert meta['quantization'] == 'int8-chain'


def test_quantized_checkpoint_with_device_preprocess(tmp_path):
    """int8-chain checkpoint + on-device letterbox together (the
    production deployment combo) must agree with the host-preprocess
    path on the same quantized weights."""

    from megadetector_tpu.models.convert_weights import (
        quantize_checkpoint, save_checkpoint)
    from megadetector_tpu.models.detector import TPUDetector
    from megadetector_tpu.utils.md_tests import (MDTestOptions,
                                                 compare_detection_lists)

    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    params = yolov5.init_params(cfg, seed=9)
    f_path = str(tmp_path / 'float.npz')
    save_checkpoint(params, f_path, {
        'arch': 'yolov5n', 'model_type': 'yolov5', 'num_classes': 3,
        'class_names': ['animal', 'person', 'vehicle'],
        'image_size': 64, 'anchors': cfg.anchors.tolist()})
    q_path = str(tmp_path / 'q.npz')
    quantize_checkpoint(f_path, q_path, calibration_image_size=64)

    host = TPUDetector(q_path)
    device = TPUDetector(q_path, detector_options={
        'preprocess_mode': 'device'})

    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (56, 72, 3), dtype=np.uint8)
    out_h = host.generate_detections_one_image(
        img, 'x.jpg', detection_threshold=0.2)
    out_d = device.generate_detections_one_image(
        img, 'x.jpg', detection_threshold=0.2)
    assert out_d['detections'] is not None

    # Device letterbox is within 0.5/255 of cv2 per pixel; allow a
    # slightly wider conf band than the bit-parity tier
    options = MDTestOptions()
    options.comparison_confidence_threshold = 0.3
    options.iou_match_threshold = 0.8
    options.max_conf_error = 0.05
    options.max_coord_error = 0.02
    result = compare_detection_lists(out_h['detections'],
                                     out_d['detections'],
                                     options=options, image_id='x.jpg')
    assert result['errors'] == [], result['errors']


def test_quantize_checkpoint_rejects_non_yolov5(tmp_path):
    """The CLI advertises --quantize; non-yolov5 checkpoints must fail
    with a clear message, not an internal config assert."""

    import json
    import numpy as np
    from megadetector_tpu.models.convert_weights import (
        quantize_checkpoint, save_checkpoint)

    path = str(tmp_path / 'v8.npz')
    save_checkpoint({'dummy': np.zeros((1,), np.float32)}, path,
                    {'arch': 'yolov8l', 'num_classes': 3})
    with pytest.raises(ValueError, match='yolov5'):
        quantize_checkpoint(path, str(tmp_path / 'q.npz'))


def test_chained_conv_folds_producer_scale():
    """
    Scale folding: a chained conv must consume a QTensor at the
    producer's own static scale (folded into the epilogue multiplier)
    rather than requantizing onto the calibrated x_scale grid. Feeding
    the same underlying values at two different producer scales must
    give identical outputs, and the result must equal the explicit
    linear-algebra reference at the producer's scale.
    """

    import jax.numpy as jnp

    from megadetector_tpu.ops import quantization as q

    rng = np.random.RandomState(7)
    w = rng.uniform(-0.5, 0.5, (3, 3, 128, 128)).astype(np.float32)
    w_q, w_scale = q.quantize_conv_weight(w)
    params = q.QConvParams({
        'w_q': jnp.asarray(w_q), 'w_scale': jnp.asarray(w_scale),
        'b': jnp.zeros((128,), jnp.float32),
        # deliberately different from the producer scales below: with
        # requant-to-x_scale semantics the two runs would disagree
        'x_scale': 0.0123, 'y_scale': 0.02})

    q_vals = rng.randint(-100, 101, (1, 16, 16, 128)).astype(np.int8)
    s1 = 0.005
    x1 = q.QTensor(jnp.asarray(q_vals), s1)

    y1 = np.asarray(q.chained_conv(params, x1, 1, 1).q)
    # the x_scale param must not influence QTensor consumption
    params_other = q.QConvParams(dict(params, x_scale=0.9))
    y1b = np.asarray(q.chained_conv(params_other, x1, 1, 1).q)
    assert np.array_equal(y1, y1b), \
        'calibrated x_scale leaked into QTensor consumption'

    # explicit reference at the producer's scale
    import jax as _jax
    acc = _jax.lax.conv_general_dilated(
        x1.q, params['w_q'], window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32)
    yf = np.asarray(acc, np.float32) * (np.asarray(w_scale) * s1)
    yf = yf * (1.0 / (1.0 + np.exp(-yf)))
    ref = np.clip(np.round(yf / 0.02), -127, 127).astype(np.int8)
    mismatch = (ref.astype(np.int32) - y1.astype(np.int32))
    # f32 sigmoid rounding may flip a cell by 1 ulp of the int8 grid
    assert np.abs(mismatch).max() <= 1
    assert (mismatch != 0).mean() < 0.01
