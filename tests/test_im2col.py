"""
Stem im2col-GEMM (ops/im2col.py): numerics vs lax.conv, eligibility
gate, model-level routing through yolov5._conv, and detector option.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megadetector_tpu.ops import im2col


@pytest.mark.parametrize('case', [
    # (H, W, cin, cout, k, strides, pads) — folded l0, raw l0, asym
    (20, 16, 12, 32, (6, 3), (2, 1), ((2, 2), (1, 1))),
    (24, 20, 3, 16, (6, 6), (2, 2), ((2, 2), (2, 2))),
    (10, 12, 8, 24, (3, 2), (2, 1), ((1, 1), (1, 0))),
])
def test_matches_conv(case):
    h, w, cin, cout, (kh, kw), strides, pads = case
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, h, w, cin)), jnp.float32)
    wt = jnp.asarray(rng.uniform(-0.3, 0.3, (kh, kw, cin, cout)),
                     jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, wt, window_strides=strides, padding=pads,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    got = im2col.conv_im2col(x, wt, strides, pads)
    assert got.shape == ref.shape
    assert np.allclose(np.asarray(got), np.asarray(ref),
                       rtol=1e-5, atol=1e-5)


def test_eligibility_gate():
    assert im2col.eligible((6, 3, 12, 128))    # folded stem
    assert im2col.eligible((6, 6, 3, 64))      # raw stem
    assert not im2col.eligible((3, 3, 64, 128))   # thick input
    assert not im2col.eligible((7, 7, 16, 64))    # 784 > 512


def test_model_routing_identical_outputs():
    """yolov5.apply must produce (near-)identical heads with the stem
    GEMM on and off — same MAC set, different f32 reduction order."""

    from megadetector_tpu.models import yolov5
    from megadetector_tpu.ops import folding

    config = yolov5.YoloV5Config('yolov5n', num_classes=3)
    params = folding.fold_early_params(
        yolov5.init_params(config, seed=0), config, h2=False)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)), jnp.float32)

    try:
        im2col.set_stem_gemm(False)
        ref = yolov5.apply(config, params, x, dtype=jnp.float32,
                           decode=False)
        im2col.set_stem_gemm(True)
        got = yolov5.apply(config, params, x, dtype=jnp.float32,
                           decode=False)
    finally:
        im2col.set_stem_gemm(False)
    for r, g in zip(ref, got):
        assert np.allclose(np.asarray(r), np.asarray(g),
                           rtol=1e-3, atol=1e-4)


def test_detector_option(tmp_path):
    from megadetector_tpu.models import yolov5
    from megadetector_tpu.models.convert_weights import save_checkpoint
    from megadetector_tpu.models.detector import TPUDetector

    cfg = yolov5.YoloV5Config('yolov5n', num_classes=3)
    path = str(tmp_path / 'model.npz')
    save_checkpoint(yolov5.init_params(cfg, seed=0), path, {
        'arch': 'yolov5n', 'model_type': 'yolov5', 'num_classes': 3,
        'image_size': 96, 'anchors': cfg.anchors.tolist()})

    try:
        det = TPUDetector(path, detector_options={'stem_gemm': 'true'})
        assert det._stem_gemm
        assert im2col.get_stem_gemm()
        det2 = TPUDetector(path)
        assert not det2._stem_gemm
        assert not im2col.get_stem_gemm()
        det._assert_trace_globals()
        assert im2col.get_stem_gemm()
        # strict mode wins over the option
        det3 = TPUDetector(path, detector_options={
            'stem_gemm': 'true',
            'compatibility_mode': 'classic-strict'})
        assert not det3._stem_gemm
    finally:
        im2col.set_stem_gemm(False)
