"""
Width-folded early layers (ops/folding.py) must reproduce the plain
forward exactly: the folded kernels contain the same multiply-accumulate
terms, so outputs differ only by floating-point reduction order.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from megadetector_tpu.models import yolov5
from megadetector_tpu.ops import folding


@pytest.mark.parametrize('h2', [True, False])
@pytest.mark.parametrize('arch', ['yolov5n6', 'yolov5n'])
def test_folded_forward_matches_plain(arch, h2):
    config = yolov5.YoloV5Config(arch, num_classes=3)
    params = yolov5.init_params(config, seed=3)
    folded = folding.fold_early_params(params, config, h2=h2)
    assert folded['l0']['w'].shape == ((3, 3, 24, 32) if h2
                                       else (6, 3, 12, 32))
    assert folding.params_are_folded(folded)
    assert not folding.params_are_folded(params)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 192, 192, 3)), jnp.float32)

    ref = np.asarray(jax.jit(
        lambda p, x: yolov5.apply(config, p, x))(params, x))
    got = np.asarray(jax.jit(
        lambda p, x: yolov5.apply(config, p, x))(folded, x))
    assert ref.shape == got.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_folded_heads_match_per_level():
    """Raw head outputs (pre-decode) must match too — catches any
    geometry slip that decode could mask."""

    config = yolov5.YoloV5Config('yolov5n6', num_classes=3)
    params = yolov5.init_params(config, seed=5)
    folded = folding.fold_early_params(params, config)

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 256, 192, 3)), jnp.float32)

    ref = jax.jit(lambda p, x: yolov5.apply(
        config, p, x, decode=False))(params, x)
    got = jax.jit(lambda p, x: yolov5.apply(
        config, p, x, decode=False))(folded, x)
    for lvl, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-4,
            err_msg='level {}'.format(lvl))


def test_fold_idempotent_and_guarded():
    config = yolov5.YoloV5Config('yolov5n6', num_classes=3)
    params = yolov5.init_params(config, seed=0)
    folded = folding.fold_early_params(params, config)
    again = folding.fold_early_params(folded, config)
    assert again is folded

    # Non-foldable config (first layer not the 6x6s2 stem) passes through
    class FakeConfig:
        layers = [dict(kind='conv', k=3, s=1, p=1, c_in=3)] * 4
        save_indices = set()
    assert folding.fold_early_params(params, FakeConfig()) is params


def test_folded_chain_quantization_composes():
    """Chain quantization over folded params: l0-l2 stay float (the
    float-store policy), folded l3 gets int8 weights, and the forward
    still runs and stays close to the float folded forward."""

    from megadetector_tpu.ops import quantization as q

    config = yolov5.YoloV5Config('yolov5n6', num_classes=3)
    params = yolov5.init_params(config, seed=7)
    folded = folding.fold_early_params(params, config)
    detect_name = 'l{}'.format(len(config.layers) - 1)
    chained = q.quantize_params_chain(folded, skip_names=(detect_name,))
    assert 'w' in chained['l0']
    assert 'w_q' in chained['l3']
    assert tuple(chained['l3']['w_q'].shape[:2]) == (3, 2)

    rng = np.random.RandomState(2)
    calib = rng.uniform(0, 1, (1, 192, 192, 3)).astype(np.float32)
    q.calibrate_chain_scales(yolov5.apply, config, chained, calib)

    x = jnp.asarray(rng.uniform(0, 1, (1, 192, 192, 3)), jnp.float32)
    ref = np.asarray(jax.jit(
        lambda p, x: yolov5.apply(config, p, x))(folded, x))
    got = np.asarray(jax.jit(
        lambda p, x: yolov5.apply(config, p, x))(chained, x))
    # int8 tolerance: scores/logits drift but stay close
    assert np.mean(np.abs(got[..., 4:] - ref[..., 4:])) < 0.02
