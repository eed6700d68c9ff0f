"""
int8 chained-inference tests for the EfficientNetV2 classifier.

The detector's chain design (ops/quantization.py) applied to the
classifier: expand/project/head convs run int8 with calibrated static
scales, the inter-block residual stream is stored int8 at a calibrated
per-block res_scale, and dw/SE/stem/fc stay float. These tests pin the
quantization policy, the calibration plumbing (x/y/res scales), the
numerics envelope vs the float forward, and the SpeciesClassifier
auto-calibration flow. Speed claims live in
experiments/exp_clf_int8.py (hardware).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megadetector_tpu.models import efficientnet as effnet
from megadetector_tpu.ops import quantization as q


def _residual_config():
    """Tiny config whose mb stage has residual blocks (the stock
    efficientnetv2_test stages are all single-layer, so no quantized
    residual path would be exercised)."""

    cfg = effnet.EfficientNetConfig('efficientnetv2_test',
                                    num_classes=6, image_size=64)
    cfg.stages = [
        ('fused', 1, 3, 1, 8, 2),
        ('fused', 2, 3, 2, 16, 2),
        ('mb', 2, 3, 2, 24, 3),
    ]
    return cfg


def _sane_params(cfg, seed=0, scale=0.4):
    """He-init explodes through the BN-free inference graph; scale the
    conv weights down so activations stay in a healthy range."""

    params = effnet.init_params(cfg, seed=seed)
    return jax.tree_util.tree_map(
        lambda a: a * scale if a.ndim == 4 else a, params)


def _walk_qnodes(params):
    nodes = []

    def walk(node, path):
        if isinstance(node, dict):
            if 'w_q' in node:
                nodes.append((path, node))
            else:
                for k, v in node.items():
                    walk(v, path + (k,))
    walk(params, ())
    return nodes


def test_quantize_policy_structure():
    """stem/dw/SE/fc stay float; expand/project/head go int8;
    float_stages are honored."""

    cfg = _residual_config()
    params = _sane_params(cfg)
    pq = effnet.quantize_params_chain(params, cfg,
                                      float_stages=('stage0',))

    assert effnet.params_are_chain_quantized(pq)
    qpaths = {p for p, _ in _walk_qnodes(pq)}
    # head quantized, stem/fc untouched (shared float nodes)
    assert ('head',) in qpaths
    assert 'w' in pq['stem'] and 'w' in pq['fc']
    # float_stages: no quantized node under stage0
    assert not any(p[0] == 'stage0' for p in qpaths)
    # mb blocks: expand/project quantized, dw/se float
    b0 = pq['stage2']['b0']
    assert 'w_q' in b0['expand'] and 'w_q' in b0['project']
    assert 'w' in b0['dw'] and 'w' in b0['se_reduce'] \
        and 'w' in b0['se_expand']
    # per-output-channel weight scales
    assert b0['expand']['w_scale'].shape == \
        (b0['expand']['w_q'].shape[-1],)
    assert b0['expand']['w_q'].dtype == np.int8


def test_calibration_bakes_all_scales():
    """Every quantized node gets x_scale/y_scale; residual blocks'
    projects additionally get res_scale (and only those)."""

    cfg = _residual_config()
    params = _sane_params(cfg)
    pq = effnet.quantize_params_chain(params, cfg, float_stages=())
    x = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32)
    q.calibrate_chain_scales(effnet.apply, cfg, pq, x)

    nodes = _walk_qnodes(pq)
    assert all('y_scale' in n for _, n in nodes)
    assert all('x_scale' in n for _, n in nodes)
    res_paths = {p for p, n in nodes if 'res_scale' in n}
    # residual blocks (stride 1, c_in == c_out): both stage0 blocks,
    # stage1 b1, stage2 b1/b2 — projects only
    expected = {('stage0', 'b0', 'project'), ('stage0', 'b1', 'project'),
                ('stage1', 'b1', 'project'),
                ('stage2', 'b1', 'project'), ('stage2', 'b2', 'project')}
    assert res_paths == expected
    # static scales are Python floats (trace-time constants)
    for _, n in nodes:
        assert isinstance(n['y_scale'], float)


def test_chain_forward_close_to_float():
    """Calibrated int8 forward tracks the f32 forward within a small
    relative envelope on the logits, with QTensors never leaking out."""

    cfg = _residual_config()
    params = _sane_params(cfg)
    x = np.random.RandomState(2).rand(4, 64, 64, 3).astype(np.float32)
    ref = np.asarray(effnet.apply(
        cfg, jax.tree_util.tree_map(jnp.asarray, params),
        jnp.asarray(x)))

    pq = effnet.quantize_params_chain(params, cfg, float_stages=())
    q.calibrate_chain_scales(effnet.apply, cfg, pq, x)
    out = effnet.apply(cfg, pq, jnp.asarray(x), dtype=jnp.float32)
    assert out.dtype == jnp.float32
    out = np.asarray(out)

    scale = np.abs(ref).max() + 1e-9
    rel = np.abs(out - ref).max() / scale
    assert rel < 0.1, 'int8 drift {:.3f} of logit range'.format(rel)


def test_uncalibrated_dynamic_path_runs():
    """w_q without y_scale falls back to dynamic per-tensor scales (the
    calibration-pass flavor) and still produces finite logits."""

    cfg = _residual_config()
    params = _sane_params(cfg)
    pq = effnet.quantize_params_chain(params, cfg, float_stages=())
    x = np.random.RandomState(3).rand(2, 64, 64, 3).astype(np.float32)
    out = np.asarray(effnet.apply(cfg, pq, jnp.asarray(x)))
    assert out.shape == (2, cfg.num_classes)
    assert np.isfinite(out).all()


@pytest.fixture(scope='module')
def tiny_classifier_ckpt(tmp_path_factory):
    from megadetector_tpu.models.convert_weights import save_checkpoint
    folder = tmp_path_factory.mktemp('clf_int8')
    cfg = effnet.EfficientNetConfig('efficientnetv2_test', num_classes=4)
    params = _sane_params(cfg, seed=5, scale=0.5)
    path = str(folder / 'classifier.npz')
    save_checkpoint(params, path, {
        'arch': 'efficientnetv2_test',
        'num_classes': 4,
        'class_names': ['deer', 'fox', 'cow', 'other'],
        'image_size': 64,
    })
    return path


def test_species_classifier_int8_auto_calibration(tiny_classifier_ckpt):
    """quantize='int8' auto-calibrates on the first batch, classifies
    every batch (including the first) through the calibrated chain
    program, and stays deterministic across repeats."""

    from megadetector_tpu.models.classifier import SpeciesClassifier

    clf = SpeciesClassifier(tiny_classifier_ckpt,
                            {'quantize': 'int8', 'dtype': 'float32'})
    assert clf.quantize == 'int8'
    assert not clf._calibrated

    rng = np.random.RandomState(7)
    crops = [rng.randint(0, 255, (40, 30, 3), dtype=np.uint8)
             for _ in range(3)]
    probs1 = clf.classify_batch(crops)
    assert clf._calibrated
    assert probs1.shape == (3, 4)
    np.testing.assert_allclose(probs1.sum(axis=1), 1.0, atol=1e-4)

    # same crops again -> identical results (same compiled program)
    probs2 = clf.classify_batch(crops)
    np.testing.assert_array_equal(probs1, probs2)

    # close to the float classifier on these shallow random weights
    clf_f = SpeciesClassifier(tiny_classifier_ckpt,
                              {'dtype': 'float32'})
    probs_f = clf_f.classify_batch(crops)
    assert np.abs(probs1 - probs_f).max() < 0.05


def test_species_classifier_explicit_calibrate(tiny_classifier_ckpt):
    from megadetector_tpu.models.classifier import SpeciesClassifier

    clf = SpeciesClassifier(tiny_classifier_ckpt,
                            {'quantize': 'int8', 'dtype': 'float32'})
    rng = np.random.RandomState(9)
    calib = [rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
             for _ in range(4)]
    clf.calibrate(calib)
    assert clf._calibrated
    probs = clf.classify_batch(calib[:2])
    assert probs.shape == (2, 4)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-4)


def test_species_classifier_rejects_bad_quantize(tiny_classifier_ckpt):
    from megadetector_tpu.models.classifier import SpeciesClassifier

    with pytest.raises(ValueError):
        SpeciesClassifier(tiny_classifier_ckpt, {'quantize': 'int4'})
