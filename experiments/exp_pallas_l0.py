"""Pallas fused l0 vs XLA folded l0 at b64 @1280 (hardware).

Per-execution relay overhead is ~5.5 ms (see NEXT.md); compare
differences, and run cast-only as the shared floor.
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

from megadetector_tpu.models import yolov5
from megadetector_tpu.ops import folding
from megadetector_tpu.ops import pallas_l0

BATCH = int(os.environ.get('EXP_BATCH', '64'))
SIZE = 1280
N = 8

config = yolov5.YoloV5Config('yolov5l6', num_classes=3)
folded = folding.fold_early_params(yolov5.init_params(config, seed=0),
                                   config)
l0 = folded['l0']
l0_bf = {'w': jnp.asarray(l0['w'], jnp.bfloat16),
         'b': jnp.asarray(l0['b'], jnp.bfloat16)}
w_i, b_i = pallas_l0.prepare_l0_weights(l0)
w_i = jax.device_put(w_i)
b_i = jax.device_put(b_i)
l0_bf = jax.device_put(l0_bf)

rng = np.random.RandomState(0)
images = jax.device_put(
    rng.randint(0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8))
_ = np.asarray(jax.device_get(images[:1, :1, :1, 0]))


def xla_l0(images_u8):
    x = images_u8.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
    b_, h, w_, c = x.shape
    xf = x.reshape(b_, h, w_ // 4, 12)
    y = yolov5._conv(l0_bf, xf, (2, 1), jnp.bfloat16, pad=((2, 2), (1, 1)))
    return y[0, 0, 0, 0].astype(jnp.float32)


def timeit(fn, label, *args):
    f = jax.jit(fn)
    out = f(*args)
    _ = np.asarray(jax.device_get(jnp.ravel(out)[:1]))
    t0 = time.time()
    outs = [f(*args) for _ in range(N)]
    _ = np.asarray(jax.device_get(jnp.ravel(outs[-1])[:1]))
    dt = (time.time() - t0) / N
    print('{:28s}: {:7.2f} ms'.format(label, dt * 1000), flush=True)
    return dt


timeit(xla_l0, 'XLA folded l0 (incl cast)', images)
for r in (16, 32, 64):
    try:
        timeit(lambda im, rr=r: pallas_l0.l0_fused(
            im, w_i, b_i, rows_per_band=rr)[0, 0, 0, 0].astype(jnp.float32),
            'pallas l0 R={}'.format(r), images)
    except Exception as e:
        print('R={} failed: {}'.format(r, str(e)[:300]), flush=True)

# numerics on-chip
small = images[:2]
a = np.asarray(jax.device_get(jax.jit(
    lambda im: yolov5._conv(
        l0_bf,
        (im.astype(jnp.bfloat16) / jnp.bfloat16(255.0)).reshape(
            2, SIZE, SIZE // 4, 12),
        (2, 1), jnp.bfloat16, pad=((2, 2), (1, 1))))(small)).astype(
            np.float32))
bq = np.asarray(jax.device_get(
    pallas_l0.l0_fused(small, w_i, b_i, rows_per_band=32)).astype(
        np.float32))
d = np.abs(a - bq)
print('vs XLA bf16: max {:.4f} p99 {:.4f}'.format(
    d.max(), np.percentile(d, 99)), flush=True)
os._exit(0)
