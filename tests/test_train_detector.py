"""Detector fine-tuning tests: loss math, overfit dynamics, sharded step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megadetector_tpu.models import yolov5
from megadetector_tpu.training.train_detector import (
    _ciou, detection_loss, make_detector_train_step,
    make_sharded_detector_train_step, pad_targets)


@pytest.fixture(scope='module')
def cfg():
    return yolov5.YoloV5Config('yolov5n', num_classes=3)


def test_ciou_identical_boxes():
    box = jnp.asarray([[5.0, 5.0, 2.0, 3.0]])
    v = np.asarray(_ciou(box, box))
    assert v[0] == pytest.approx(1.0, abs=1e-5)


def test_ciou_disjoint_boxes():
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.asarray([[10.0, 10.0, 1.0, 1.0]])
    v = np.asarray(_ciou(a, b))
    assert v[0] < 0  # IoU 0 minus distance penalty


def test_pad_targets():
    boxes, classes, mask = pad_targets(
        [np.array([[0.5, 0.5, 0.2, 0.2]]), np.zeros((0, 4))],
        [np.array([1]), np.zeros((0,), int)], max_targets=8)
    assert boxes.shape == (2, 8, 4)
    assert mask[0, 0] and not mask[0, 1]
    assert not mask[1].any()


@pytest.mark.slow
def test_loss_finite_and_positive(cfg):
    params = yolov5.init_params(cfg, seed=0)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    rng = np.random.RandomState(0)
    images = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    gt_boxes, gt_classes, gt_mask = pad_targets(
        [np.array([[0.5, 0.5, 0.3, 0.3]]),
         np.array([[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.25, 0.25]])],
        [np.array([0]), np.array([1, 2])], max_targets=8)
    loss, metrics = detection_loss(cfg, params, images, gt_boxes,
                                   gt_classes, gt_mask)
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert float(metrics['n_positives']) > 0
    # Gradients flow and are finite
    grads = jax.grad(
        lambda p: detection_loss(cfg, p, images, gt_boxes, gt_classes,
                                 gt_mask)[0])(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


@pytest.mark.slow
def test_overfit_single_batch(cfg):
    import optax
    params = jax.tree_util.tree_map(
        jnp.asarray, yolov5.init_params(cfg, seed=0))
    optimizer = optax.chain(optax.clip_by_global_norm(5.0),
                            optax.adam(1e-3))
    opt_state = optimizer.init(params)
    step = jax.jit(make_detector_train_step(cfg, optimizer))

    rng = np.random.RandomState(1)
    images = rng.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    gt_boxes, gt_classes, gt_mask = pad_targets(
        [np.array([[0.5, 0.5, 0.4, 0.4]]),
         np.array([[0.25, 0.25, 0.3, 0.3]])],
        [np.array([0]), np.array([1])], max_targets=4)

    losses = []
    for _ in range(10):
        params, opt_state, metrics = step(params, opt_state, images,
                                          gt_boxes, gt_classes, gt_mask)
        losses.append(float(metrics['loss']))
    assert all(np.isfinite(l) for l in losses)
    assert min(losses[1:]) < losses[0]


@pytest.mark.slow
def test_sharded_detector_train_step(cfg):
    # Also exercised every round by the driver's dryrun_multichip
    # (__graft_entry__.py), which is the recorded multichip evidence
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = jax.devices()[:8]
    mesh = Mesh(np.array(devices), ('data',))
    replicated = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P('data'))

    params = jax.device_put(jax.tree_util.tree_map(
        jnp.asarray, yolov5.init_params(cfg, seed=0)), replicated)
    optimizer = optax.adam(1e-3)
    opt_state = jax.device_put(optimizer.init(params), replicated)
    step = make_sharded_detector_train_step(cfg, optimizer, mesh)

    rng = np.random.RandomState(2)
    images = jax.device_put(
        rng.randint(0, 255, (16, 64, 64, 3)).astype(np.uint8), data)
    gt_boxes, gt_classes, gt_mask = pad_targets(
        [np.array([[0.5, 0.5, 0.3, 0.3]])] * 16,
        [np.array([0])] * 16, max_targets=4)
    params, opt_state, metrics = step(
        params, opt_state, images, jax.device_put(gt_boxes, data),
        jax.device_put(gt_classes, data), jax.device_put(gt_mask, data))
    assert np.isfinite(float(metrics['loss']))
