"""
Candidate-selection cost split at the PRODUCTION head shapes
(960x1280 canvas, yolov5l6: 4 levels, na=3, nc=3, b64): the stage
profile (exp_int8_stage_profile) bills 13.05 ms to "+select" — this
splits it into elementwise score computation vs per-level exact top_k,
and measures the candidates:

  scores    — sigmoid/max/where/count only, no selection
  exact     — production select_topk_candidates (per-level lax.top_k)
  approx    — per-level lax.approx_max_k(recall_target=0.95) + same
              gathers (numerics NOT parity-safe standalone; candidate
              for a verified fast path with an exact-count cond
              fallback)

Each variant runs on the same synthetic head tensors; reduce to a
scalar so output transfer is negligible. ~5.5 ms dispatch floor is
common. Run alone; self-exits via watchdog.
"""

import os
import sys
import threading
import time

os.environ.setdefault('OMP_NUM_THREADS', '1')

threading.Timer(int(os.environ.get('EXP_WALL', '1100')),
                lambda: os._exit(3)).start()

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from megadetector_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from megadetector_tpu.models import yolov5
from megadetector_tpu.ops.decode import select_topk_candidates

B = int(os.environ.get('EXP_B', '64'))
K = 512
H, W = 960, 1280

config = yolov5.YoloV5Config('yolov5l6', num_classes=3)
nc = 3
na = 3
no = 5 + nc

rng = np.random.RandomState(0)
heads = []
for stride in config.strides:
    h, w = H // stride, W // stride
    # logits: mostly negative objectness (sparse-ish), like real heads
    raw = rng.normal(-3.0, 1.5, (B, h, w, na * no)).astype(np.float32)
    heads.append(jax.device_put(jnp.asarray(raw, jnp.bfloat16)))
_ = np.asarray(jax.device_get(heads[-1][:1, :1, :1, 0]))
print('staged; anchors/level:',
      [int(np.prod(h.shape[1:3])) * na for h in heads], flush=True)


def v_scores(heads):
    total = jnp.float32(0)
    count = None
    for raw in heads:
        b, h, w, _ = raw.shape
        x = raw.reshape(b, h * w * na, no)
        obj = jax.nn.sigmoid(x[..., 4].astype(jnp.float32))
        cls = jax.nn.sigmoid(x[..., 5:].astype(jnp.float32))
        best = jnp.max(cls, axis=-1)
        score = obj * best
        valid = (obj > 0.005) & (score > 0.005)
        lvl_count = jnp.sum(valid.astype(jnp.int32), axis=-1)
        count = lvl_count if count is None else count + lvl_count
        total = total + jnp.where(valid, score, -1.0)[:, 0].sum()
    return total + count.sum()


def v_exact(heads):
    out = select_topk_candidates(heads, config.anchors, config.strides,
                                 nc, jnp.float32(0.005), K)
    return out['scores'].sum() + out['n_candidates'].sum()


def v_approx(heads):
    total = jnp.float32(0)
    for raw in heads:
        b, h, w, _ = raw.shape
        n = h * w * na
        x = raw.reshape(b, n, no)
        obj = jax.nn.sigmoid(x[..., 4].astype(jnp.float32))
        cls = jax.nn.sigmoid(x[..., 5:].astype(jnp.float32))
        best = jnp.max(cls, axis=-1)
        score = obj * best
        valid = (obj > 0.005) & (score > 0.005)
        ranked = jnp.where(valid, score, -1.0)
        k_l = min(K, n)
        if n > 2 * K:
            ts, ti = jax.lax.approx_max_k(ranked, k_l,
                                          recall_target=0.95)
        else:
            ts, ti = jax.lax.top_k(ranked, k_l)
        rows = jnp.take_along_axis(x, ti[..., None], axis=1)
        total = total + ts.sum() + \
            rows[..., :4].astype(jnp.float32).sum()
    return total


for label, fn in (('scores', v_scores), ('exact', v_exact),
                  ('approx', v_approx)):
    f = jax.jit(fn)
    t0 = time.time()
    out = f(heads)
    _ = float(np.asarray(jax.device_get(out)))
    print('{}: compile+first {:.1f}s'.format(label, time.time() - t0),
          flush=True)
    n = 10
    t0 = time.time()
    outs = [f(heads) for _ in range(n)]
    _ = float(np.asarray(jax.device_get(outs[-1])))
    dt = (time.time() - t0) / n
    print('{:8s}: {:7.2f} ms/batch'.format(label, dt * 1000), flush=True)

os._exit(0)
