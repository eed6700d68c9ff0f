"""
l0 stem variants at b64: the folded XLA conv's cost is dominated by the
lane-padded [B,1280,320,12] bf16 intermediate (12 of 128 lanes used).
Try: int8 output storage (halves the l0->l1 traffic), NCHW layout
(channels become a major dim, no lane padding), and H-major fold.
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

B = 64
N = 6
dtype = jnp.bfloat16

config = yolov5.YoloV5Config('yolov5l6', num_classes=3)
folded = folding.fold_early_params(yolov5.init_params(config, seed=0),
                                   config)
l0 = {k: jnp.asarray(v, jnp.bfloat16) for k, v in folded['l0'].items()}
l0 = jax.device_put(l0)

rng = np.random.RandomState(0)
images = jax.device_put(
    rng.randint(0, 255, (B, 1280, 1280, 3), dtype=np.uint8))
_ = np.asarray(jax.device_get(images[:1, :1, :1, 0]))


def timeit(fn, label, *args):
    f = jax.jit(fn)
    out = f(*args)
    _ = np.asarray(jax.device_get(out))
    t0 = time.time()
    outs = [f(*args) for _ in range(N)]
    _ = np.asarray(jax.device_get(outs[-1]))
    dt = (time.time() - t0) / N
    print('{:40s}: {:7.2f} ms'.format(label, dt * 1000), flush=True)
    return dt


def conv(x, w, stride, pad, dn=('NHWC', 'HWIO', 'NHWC')):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=pad, dimension_numbers=dn)


def silu(y):
    return y * jax.nn.sigmoid(y)


def l0_current(p, u8):
    x = u8.astype(dtype) / dtype(255.0)
    xf = x.reshape(B, 1280, 320, 12)
    y = silu(conv(xf, p['w'], (2, 1), ((2, 2), (1, 1))) + p['b'])
    return y[0, 0, 0, :4].astype(jnp.float32).sum()


def l0_int8_store(p, u8):
    x = u8.astype(dtype) / dtype(255.0)
    xf = x.reshape(B, 1280, 320, 12)
    y = silu(conv(xf, p['w'], (2, 1), ((2, 2), (1, 1))) + p['b'])
    yq = jnp.clip(jnp.round(y.astype(jnp.float32) * 127.0), -127,
                  127).astype(jnp.int8)
    return yq[0, 0, 0, :4].astype(jnp.float32).sum()


def l0_nchw(p, u8):
    x = u8.astype(dtype) / dtype(255.0)
    xf = x.reshape(B, 1280, 320, 12).transpose(0, 3, 1, 2)
    w = p['w'].transpose(3, 2, 0, 1)  # HWIO -> OIHW
    y = conv(xf, w, (2, 1), ((2, 2), (1, 1)),
             dn=('NCHW', 'OIHW', 'NCHW'))
    y = silu(y + p['b'][None, :, None, None])
    return y[0, :4, 0, 0].astype(jnp.float32).sum()


def l0_u8_fold_input(p, u8f):
    """Input arrives pre-folded as u8 (host-side free reshape)."""
    x = u8f.astype(dtype) / dtype(255.0)
    y = silu(conv(x, p['w'], (2, 1), ((2, 2), (1, 1))) + p['b'])
    return y[0, 0, 0, :4].astype(jnp.float32).sum()


timeit(l0_current, 'l0f current (cast+fold+conv)', l0, images)
timeit(l0_int8_store, 'l0f + int8 output store', l0, images)
timeit(l0_nchw, 'l0f NCHW', l0, images)

images_folded = jax.device_put(np.ascontiguousarray(
    np.asarray(jax.device_get(images)).reshape(B, 1280, 320, 12)))
_ = np.asarray(jax.device_get(images_folded[:1, :1, :1, 0]))
timeit(l0_u8_fold_input, 'l0f from pre-folded u8', l0, images_folded)
os._exit(0)
