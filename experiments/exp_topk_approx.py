"""
Candidate-selection cost: exact lax.top_k vs lax.approx_max_k at the
production selection shape ([64, ~102k] scores -> 512 candidates), and
the full batched_nms with each.
"""

import os
import sys
import threading
import time

threading.Timer(560, lambda: os._exit(3)).start()

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from megadetector_tpu.ops.nms import nms_on_candidates, batched_nms

B = 64
A = 102000
K = 512

rng = np.random.RandomState(0)
pred_host = rng.uniform(0, 1, (B, A, 8)).astype(np.float32)
pred_host[..., 4] = rng.uniform(0, 0.12, (B, A))  # sparse-ish objectness
pred = jax.device_put(jnp.asarray(pred_host))
_ = np.asarray(jax.device_get(pred[0, 0]))


def fence(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))


def timeit(fn, label, *args):
    f = jax.jit(fn)
    fence(f(*args))
    t0 = time.time()
    outs = [f(*args) for _ in range(8)]
    fence(outs[-1])
    dt = (time.time() - t0) / 8
    print('{:36s}: {:7.2f} ms'.format(label, dt * 1000), flush=True)
    return dt


def scores_of(p):
    obj = p[..., 4]
    best = jnp.max(p[..., 5:] * p[..., 4:5], axis=-1)
    valid = (obj > 0.005) & (best > 0.005)
    return jnp.where(valid, best, -1.0)


timeit(lambda p: scores_of(p).sum(), 'score computation only', pred)
timeit(lambda p: jax.lax.top_k(scores_of(p), K)[0].sum(),
       'scores + exact top_k', pred)
timeit(lambda p: jax.lax.approx_max_k(scores_of(p), K)[0].sum(),
       'scores + approx_max_k (.95)', pred)
timeit(lambda p: jax.lax.approx_max_k(
    scores_of(p), K, recall_target=0.99)[0].sum(),
    'scores + approx_max_k (.99)', pred)
timeit(lambda p: batched_nms(p, jnp.float32(0.005), jnp.float32(0.45),
                             max_det=300, pre_nms_topk=K),
       'full batched_nms (exact)', pred)


def nms_approx(p, conf, iou):
    ranked = scores_of(p)
    cls_conf = p[..., 5:] * p[..., 4:5]
    best_class = jnp.argmax(cls_conf, axis=-1).astype(jnp.int32)
    top_scores, top_idx = jax.lax.approx_max_k(ranked, K,
                                               recall_target=0.99)
    boxes = jnp.take_along_axis(p[..., :4], top_idx[..., None], axis=1)
    classes = jnp.take_along_axis(best_class, top_idx, axis=1)
    cands = {'boxes_cxcywh': boxes, 'scores': top_scores,
             'classes': classes, 'valid': top_scores > 0.0}
    return nms_on_candidates(cands, iou, max_det=300)


timeit(lambda p: nms_approx(p, jnp.float32(0.005), jnp.float32(0.45)),
       'full nms with approx_max_k', pred)

# Recall sanity at this distribution
exact = jax.lax.top_k(scores_of(pred), K)[0]
approx = jax.lax.approx_max_k(scores_of(pred), K, recall_target=0.99)[0]
e = np.asarray(exact)
a = np.sort(np.asarray(approx))[:, ::-1]
overlap = np.mean([
    np.isin(np.round(a[i], 6), np.round(e[i], 6)).mean()
    for i in range(B)])
print('approx recall vs exact: {:.4f}'.format(overlap))
print('top-50 identical: {}'.format(bool(np.allclose(a[:, :50],
                                                     e[:, :50]))))
os._exit(0)
