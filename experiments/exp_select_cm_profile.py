"""
Selection-segment micro A/B: row-major vs channel-major layout
(ops/decode._select_level_cm), on detect-head-shaped random tensors at
the production b64 / 960x1280 shapes.

The stage profile (docs/perf-profile.md) charges 13.1 ms to select_topk
and the approx-top_k e2e A/B was neutral, implicating the full-map
score computation, which in the row-major layout runs every elementwise
op on an 8-wide minor dim (8/128 lanes). This measures, with the relay
floor subtracted via a null program and R in-program repetitions:

  1. scoremap_rm / scoremap_cm — obj/cls sigmoid+max+threshold+count
  2. select_rm / select_cm — the full selection incl. top_k + gather

Run alone. Self-exits via watchdog.
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

BATCH = int(os.environ.get('EXP_BATCH', '64'))
N_IT = int(os.environ.get('EXP_N', '6'))
R = int(os.environ.get('EXP_R', '8'))

config = yolov5.YoloV5Config('yolov5l6', num_classes=3)
NC = 3
NO = 5 + NC
NA = 3
H, W = 960, 1280
shapes = [(BATCH, H // s, W // s, NA * NO) for s in config.strides]

rng = np.random.RandomState(0)
heads = [jax.device_put(jnp.asarray(
    rng.normal(-4.0, 1.5, s).astype(np.float32), jnp.bfloat16))
    for s in shapes]
for h in heads:
    h.block_until_ready()
print('devices:', jax.devices(), flush=True)
print('head shapes:', shapes, flush=True)

anchors = jnp.asarray(config.anchors, jnp.float32)
strides = config.strides


def perturbed(heads, i):
    d = i.astype(jnp.bfloat16) * jnp.bfloat16(0.001)
    return [h + d for h in heads]


def make_null():
    def run(heads):
        def body(acc, i):
            hs = perturbed(heads, i)
            return acc + sum(jnp.sum(h.astype(jnp.float32))
                             for h in hs), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(R, dtype=jnp.int32))
        return acc
    return run


def make_scoremap(channel_major):
    def run(heads):
        def body(acc, i):
            hs = perturbed(heads, i)
            tot = jnp.float32(0)
            for raw in hs:
                b, h, w, _ = raw.shape
                if channel_major:
                    xt = raw.reshape(b, h * w, NA, NO).transpose(
                        0, 2, 3, 1)
                    obj = jax.nn.sigmoid(
                        xt[:, :, 4, :].astype(jnp.float32))
                    cls_l = xt[:, :, 5:, :]
                    best = jax.nn.sigmoid(
                        jnp.max(cls_l, axis=2).astype(jnp.float32))
                else:
                    x = raw.reshape(b, h * w * NA, NO)
                    obj = jax.nn.sigmoid(x[..., 4].astype(jnp.float32))
                    best = jax.nn.sigmoid(jnp.max(
                        x[..., 5:], axis=-1).astype(jnp.float32))
                score = obj * best
                valid = (obj > 0.005) & (score > 0.005)
                tot = tot + jnp.sum(
                    jnp.where(valid, score, 0.0)) + jnp.sum(
                        valid.astype(jnp.int32)).astype(jnp.float32)
            return acc + tot, None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(R, dtype=jnp.int32))
        return acc
    return run


def make_select(channel_major, approx):
    def run(heads):
        def body(acc, i):
            hs = perturbed(heads, i)
            cands = select_topk_candidates(
                hs, anchors, strides, NC, jnp.float32(0.005), 512,
                approx=approx, channel_major=channel_major)
            return acc + jnp.sum(cands['scores']) + jnp.sum(
                cands['boxes_cxcywh']) + jnp.sum(
                    cands['n_candidates']).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(R, dtype=jnp.int32))
        return acc
    return run


programs = [
    ('null', make_null()),
    ('scoremap_rm', make_scoremap(False)),
    ('scoremap_cm', make_scoremap(True)),
    ('select_rm', make_select(False, True)),
    ('select_cm', make_select(True, True)),
    ('select_rm_exact', make_select(False, False)),
    ('select_cm_exact', make_select(True, False)),
]

times = {}
for label, fn in programs:
    jf = jax.jit(fn)
    try:
        t0 = time.time()
        jf(heads).block_until_ready()
        print('{}: compile+first {:.1f}s'.format(
            label, time.time() - t0), flush=True)
    except Exception as e:  # noqa: BLE001
        print('{} FAILED: {}: {}'.format(
            label, type(e).__name__, str(e)[:300]), flush=True)
        continue
    t0 = time.time()
    for _ in range(N_IT):
        out = jf(heads)
    out.block_until_ready()
    dt = (time.time() - t0) / N_IT
    times[label] = dt
    print('{:16s}: {:7.2f} ms/call'.format(label, dt * 1000),
          flush=True)

if 'null' in times:
    base = times['null']
    print('--- per-rep net of null (R={}, b{}) ---'.format(R, BATCH),
          flush=True)
    for label, dt in times.items():
        if label == 'null':
            continue
        print('{:16s}: {:7.2f} ms net'.format(
            label, (dt - base) / R * 1000), flush=True)
os._exit(0)
