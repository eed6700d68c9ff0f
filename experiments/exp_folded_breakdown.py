"""Folded early-segment breakdown at b64 @1280 bf16."""

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

BATCH = 64
SIZE = 1280
N = 6
dtype = jnp.bfloat16

config = yolov5.YoloV5Config('yolov5l6', num_classes=3)
folded = folding.fold_early_params(yolov5.init_params(config, seed=0),
                                   config)
folded = jax.device_put(jax.tree_util.tree_map(
    lambda a: jnp.asarray(a, jnp.bfloat16), folded))

rng = np.random.RandomState(0)
images = jax.device_put(
    rng.randint(0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8))
_ = np.asarray(jax.device_get(images[:1, :1, :1, 0]))


def upto(cut):
    def fn(p, images_u8):
        x = images_u8.astype(dtype) / dtype(255.0)
        prev = x
        for i in range(cut + 1):
            entry = config.layers[i]
            prev = yolov5._apply_folded_layer(i, entry, p['l%d' % i],
                                              prev, dtype)
        return prev[0, 0, 0, 0].astype(jnp.float32)
    return fn


def fold_only(p, images_u8):
    x = images_u8.astype(dtype) / dtype(255.0)
    b, h, w, c = x.shape
    xf = x.reshape(b, h, w // 4, 12)
    return xf[0, 0, 0, 0].astype(jnp.float32)


def timeit(fn, label):
    f = jax.jit(fn)
    out = f(folded, images)
    _ = np.asarray(jax.device_get(out))
    t0 = time.time()
    outs = [f(folded, images) for _ in range(N)]
    _ = np.asarray(jax.device_get(outs[-1]))
    dt = (time.time() - t0) / N
    print('{:16s}: {:7.2f} ms'.format(label, dt * 1000), flush=True)
    return dt


timeit(fold_only, 'cast+fold only')
prev = 0.0
for cut, label in [(0, 'through l0f'), (1, 'through l1f'),
                   (2, 'through l2f'), (3, 'through l3f')]:
    t = timeit(upto(cut), label)
    print('   segment: {:+.2f} ms'.format((t - prev) * 1000), flush=True)
    prev = t
os._exit(0)
