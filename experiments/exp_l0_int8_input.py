"""
l0 via the int8 MXU with EXACT u8 input: x_u8 - 128 fits int8 exactly, so
l0 can run (x-128)@Wq in integer with the 128*colsum(W) correction folded
into the bias. Only W is quantized (per-out-channel) -- no activation
quantization error, no quantize epilogue on the input side.

Overhead note: this relay pays ~5.5 ms per program execution regardless
of size (measured /tmp/exp_bw.py 2026-08-17), so compare DIFFERENCES
between chains, not absolute one-op times.
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

BATCH = 64
SIZE = 1280
N = 8

config = yolov5.YoloV5Config('yolov5l6', num_classes=3)
folded = folding.fold_early_params(yolov5.init_params(config, seed=0),
                                   config)
l0 = folded['l0']
w = np.asarray(l0['w'], np.float32)        # [6,3,12,128]
b = np.asarray(l0['b'], np.float32)

# int8 per-out-channel weight quantization; fold /255 normalization and
# the +128 shift correction into scale/bias
w_absmax = np.abs(w).max(axis=(0, 1, 2))                  # [128]
w_scale = (w_absmax / 127.0).astype(np.float32)
w_q = np.clip(np.round(w / w_scale), -127, 127).astype(np.int8)
# y = conv(u8/255, w) + b = conv((u8-128), w)/255 + 128*colsum(w)/255 + b
b_eff = (b + 128.0 / 255.0 * w.sum(axis=(0, 1, 2))).astype(np.float32)
scale_eff = (w_scale / 255.0).astype(np.float32)

w_bf = jax.device_put(jnp.asarray(w, jnp.bfloat16))
b_bf = jax.device_put(jnp.asarray(b, jnp.bfloat16))
w_qd = jax.device_put(jnp.asarray(w_q))
b_effd = jax.device_put(jnp.asarray(b_eff))
scale_d = jax.device_put(jnp.asarray(scale_eff))

rng = np.random.RandomState(0)
images = jax.device_put(
    rng.randint(0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8))
_ = np.asarray(jax.device_get(images[:1, :1, :1, 0]))

STRIDES = (2, 1)
PADS = ((2, 2), (1, 1))
DN = ('NHWC', 'HWIO', 'NHWC')


def cast_only(images_u8):
    x = images_u8.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
    b_, h, w_, c = x.shape
    xf = x.reshape(b_, h, w_ // 4, 12)
    return xf[0, 0, 0, 0].astype(jnp.float32)


def l0_bf16(images_u8):
    x = images_u8.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
    b_, h, w_, c = x.shape
    xf = x.reshape(b_, h, w_ // 4, 12)
    y = jax.lax.conv_general_dilated(
        xf, w_bf, window_strides=STRIDES, padding=PADS,
        dimension_numbers=DN) + b_bf
    y = y * jax.nn.sigmoid(y)
    return y[0, 0, 0, 0].astype(jnp.float32)


def l0_int8(images_u8):
    b_, h, w_, c = images_u8.shape
    xf = images_u8.reshape(b_, h, w_ // 4, 12)
    xi = (xf.astype(jnp.int32) - 128).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xi, w_qd, window_strides=STRIDES, padding=PADS,
        dimension_numbers=DN,
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * scale_d + b_effd
    y = (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)
    return y[0, 0, 0, 0].astype(jnp.float32)


def l0_int8_xor(images_u8):
    # u8 ^ 0x80 reinterpreted as int8 equals u8 - 128 exactly
    b_, h, w_, c = images_u8.shape
    xf = images_u8.reshape(b_, h, w_ // 4, 12)
    xi = jax.lax.bitcast_convert_type(xf ^ np.uint8(0x80), jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xi, w_qd, window_strides=STRIDES, padding=PADS,
        dimension_numbers=DN,
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * scale_d + b_effd
    y = (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)
    return y[0, 0, 0, 0].astype(jnp.float32)


def timeit(fn, label):
    f = jax.jit(fn)
    out = f(images)
    _ = np.asarray(jax.device_get(out))
    t0 = time.time()
    outs = [f(images) for _ in range(N)]
    _ = np.asarray(jax.device_get(outs[-1]))
    dt = (time.time() - t0) / N
    print('{:18s}: {:7.2f} ms'.format(label, dt * 1000), flush=True)
    return dt


t_cast = timeit(cast_only, 'cast+fold only')
t_bf = timeit(l0_bf16, 'l0 bf16')
t_i8 = timeit(l0_int8, 'l0 int8 (sub)')
t_x = timeit(l0_int8_xor, 'l0 int8 (xor)')
print('l0 conv cost: bf16 {:+.2f} ms, int8 {:+.2f} ms, xor {:+.2f} ms'
      .format((t_bf - t_cast) * 1000, (t_i8 - t_cast) * 1000,
              (t_x - t_cast) * 1000))

# numerics check
f_bf = jax.jit(lambda im: None)  # placeholder
def full_bf(images_u8):
    x = images_u8.astype(jnp.float32) / jnp.float32(255.0)
    b_, h, w_, c = x.shape
    xf = x.reshape(b_, h, w_ // 4, 12)
    y = jax.lax.conv_general_dilated(
        xf, jnp.asarray(w), window_strides=STRIDES, padding=PADS,
        dimension_numbers=DN) + jnp.asarray(b)
    return y * jax.nn.sigmoid(y)
def full_i8(images_u8):
    b_, h, w_, c = images_u8.shape
    xf = images_u8.reshape(b_, h, w_ // 4, 12)
    xi = (xf.astype(jnp.int32) - 128).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xi, w_qd, window_strides=STRIDES, padding=PADS,
        dimension_numbers=DN, preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * scale_d + b_effd
    return y * jax.nn.sigmoid(y)
small = images[:1, :256, :256, :]
a = np.asarray(jax.device_get(jax.jit(full_bf)(small)))
bb = np.asarray(jax.device_get(jax.jit(full_i8)(small)))
print('abs diff p99 {:.5f} max {:.5f} (act range ~{:.2f})'.format(
    np.percentile(np.abs(a - bb), 99), np.abs(a - bb).max(),
    np.abs(a).max()))
os._exit(0)
