"""
Microbenchmarks of the early-layer conv shapes at b64, looking for
formulations XLA already runs fast (before resorting to Pallas).

Measurement-host constraints (see NEXT.md): transfer only small u8 seeds
and expand/cast ON DEVICE — the tunnel moves ~45 MB/s, and host float64
temporaries swap this 1-core box. Every case prints ms/step + TFLOP/s.
"""

import os
import sys
import threading
import time

threading.Timer(560, lambda: os._exit(3)).start()

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get('EXP_BATCH', '64'))
N_IT = int(os.environ.get('EXP_N', '6'))


def silu(y):
    return y * jax.nn.sigmoid(y)


def conv(x, w, stride, pad):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=[(pad, pad)] * 2,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


_seed_counter = [0]


def mk(shape, dtype=jnp.bfloat16):
    """Device tensor filled pseudo-randomly ON DEVICE (tiny transfer)."""

    _seed_counter[0] += 1
    key = jax.random.PRNGKey(_seed_counter[0])
    f = jax.jit(lambda k: (jax.random.uniform(
        k, shape, jnp.float32, -1, 1)).astype(dtype))
    out = f(key)
    out.block_until_ready()
    return out


def bench(name, fn, args, flops):
    # Full-tensor sum inside the jit keeps the conv un-elidable while the
    # step output stays scalar (6 live [B,640,640,64] outputs would OOM)
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    out = f(*args)
    _ = np.asarray(jax.device_get(out))
    t0 = time.time()
    outs = [f(*args) for _ in range(N_IT)]
    _ = np.asarray(jax.device_get(outs[-1]))
    dt = (time.time() - t0) / N_IT
    print('{:42s}: {:7.2f} ms  {:6.1f} TFLOP/s'.format(
        name, dt * 1000, flops / dt / 1e12), flush=True)
    del outs, out
    return dt


print('building inputs...', flush=True)

# --- l0: 6x6s2 3->64 @1280 ---
x0 = mk((B, 1280, 1280, 3))
w0 = mk((6, 6, 3, 64))
fl0 = B * 640 * 640 * 64 * 108 * 2
bench('l0 6x6s2 3->64 bf16', lambda x, w: silu(conv(x, w, 2, 2)),
      (x0, w0), fl0)

# l0 as s2d + 3x3s1 12->64 @640 (Focus equivalence)
w0b = mk((3, 3, 12, 64))


def s2d_conv(x, w):
    b, h, wd, c = x.shape
    x = x.reshape(b, h // 2, 2, wd // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, wd // 2, 4 * c)
    return silu(conv(x, w, 1, 1))


bench('l0 as s2d + 3x3s1 12->64', s2d_conv, (x0, w0b), fl0)
del x0

# --- l1: 3x3s2 64->128 @640 ---
x1 = mk((B, 640, 640, 64))
w1 = mk((3, 3, 64, 128))
fl1 = B * 320 * 320 * 128 * 64 * 9 * 2
bench('l1 3x3s2 64->128 bf16', lambda x, w: silu(conv(x, w, 2, 1)),
      (x1, w1), fl1)

# l1 as s2d + 3x3s1 256->128 @320 (stride removal)
w1b = mk((3, 3, 256, 128))
fl1b = B * 320 * 320 * 128 * 256 * 9 * 2  # 4x flops (kernel sees all phases)
bench('l1 as s2d 3x3s1 256->128 (4x flops)', s2d_conv, (x1, w1b), fl1b)
del x1

# --- l2 C3 component shapes @320 ---
x2 = mk((B, 320, 320, 128))
x2h = mk((B, 320, 320, 64))

w_1x1_128_64 = mk((1, 1, 128, 64))
fl = B * 320 * 320 * 128 * 64 * 2
bench('1x1 128->64 @320', lambda x, w: silu(conv(x, w, 1, 0)),
      (x2, w_1x1_128_64), fl)

w_1x1_128_128 = mk((1, 1, 128, 128))
fl = B * 320 * 320 * 128 * 128 * 2
bench('1x1 128->128 @320 (cv1||cv2 fused)', lambda x, w: silu(conv(x, w, 1, 0)),
      (x2, w_1x1_128_128), fl)

w_3x3_64_64 = mk((3, 3, 64, 64))
fl64 = B * 320 * 320 * 64 * 64 * 9 * 2
bench('3x3s1 64->64 @320', lambda x, w: silu(conv(x, w, 1, 1)),
      (x2h, w_3x3_64_64), fl64)

w_3x3_128_128 = mk((3, 3, 128, 128))
fl128 = B * 320 * 320 * 128 * 128 * 9 * 2
bench('3x3s1 128->128 @320 (4x flops)', lambda x, w: silu(conv(x, w, 1, 1)),
      (x2, w_3x3_128_128), fl128)

w_3x3_64_128 = mk((3, 3, 64, 128))
fl = B * 320 * 320 * 64 * 128 * 9 * 2
bench('3x3s1 64->128 @320', lambda x, w: silu(conv(x, w, 1, 1)),
      (x2h, w_3x3_64_128), fl)

w_1x1_64_64 = mk((1, 1, 64, 64))
fl = B * 320 * 320 * 64 * 64 * 2
bench('1x1 64->64 @320', lambda x, w: silu(conv(x, w, 1, 0)),
      (x2h, w_1x1_64_64), fl)

del x2, x2h

# the mid-network reference rate: 3x3 256->256 @160
x4 = mk((B, 160, 160, 256))
w4 = mk((3, 3, 256, 256))
fl = B * 160 * 160 * 256 * 256 * 9 * 2
bench('3x3s1 256->256 @160 (reference rate)', lambda x, w: silu(conv(x, w, 1, 1)),
      (x4, w4), fl)

os._exit(0)
