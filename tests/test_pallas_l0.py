"""
Interpret-mode correctness for the fused l0 Pallas kernel
(ops/pallas_l0.py) against the XLA folded l0 it is designed to replace.

The kernel cannot compile on the current hardware Mosaic stack (see the
STATUS note in ops/pallas_l0.py), so interpret mode is the verification
tier that keeps the design honest for newer stacks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

from megadetector_tpu.models import yolov5
from megadetector_tpu.ops import folding
from megadetector_tpu.ops import pallas_l0


@pytest.fixture(scope='module')
def folded_l0():
    config = yolov5.YoloV5Config('yolov5l6', num_classes=3)
    folded = folding.fold_early_params(
        yolov5.init_params(config, seed=0), config, h2=False)
    return folded['l0']


def _interp(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs['interpret'] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, 'pallas_call', patched)


@pytest.mark.parametrize('shape,rows', [((2, 128, 256), 16)])
def test_matches_xla_folded_l0(folded_l0, monkeypatch, shape, rows):
    _interp(monkeypatch)
    b, h, w = shape
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (b, h, w, 3), dtype=np.uint8))

    x = images.astype(jnp.float32) / 255.0
    xf = x.reshape(b, h, w // 4, 12)
    ref = np.asarray(yolov5._conv(
        folded_l0, xf, (2, 1), jnp.float32, pad=((2, 2), (1, 1))))

    w_i, b_i = pallas_l0.prepare_l0_weights(folded_l0)
    out = np.asarray(pallas_l0.l0_fused(images, w_i, b_i,
                                        rows_per_band=rows))

    assert out.shape == ref.shape
    diff = np.abs(ref - out)
    # bf16 kernel weights vs f32 reference
    assert diff.max() < 0.02, diff.max()


def test_rejects_bad_geometry(folded_l0):
    w_i, b_i = pallas_l0.prepare_l0_weights(folded_l0)
    images = jnp.zeros((1, 64, 64, 3), jnp.uint8)
    with pytest.raises(AssertionError):
        pallas_l0.l0_fused(images, w_i, b_i, rows_per_band=7)
